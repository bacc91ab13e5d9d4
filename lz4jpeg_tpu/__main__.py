from lz4jpeg_tpu.cli import main

raise SystemExit(main())
