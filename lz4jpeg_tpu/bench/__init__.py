"""Benchmark harness mirroring the reference's experiment methodology."""

from lz4jpeg_tpu.bench.harness import (  # noqa: F401
    BenchResult,
    run_timed,
    trimmed_mean,
    median,
)
