#!/bin/sh
# Capture the full experiment suite into committed artifacts (VERDICT r1 #4).
# Runs sequentially: the sweeps share one chip.
set -ex
cd /root/repo
python -m lz4jpeg_tpu bench lz4 --runs 10 --output results/lz4_parity.json
python -m lz4jpeg_tpu bench lz4-device --runs 6 --output results/lz4_device.json
python -m lz4jpeg_tpu bench jpeg --runs 10 --output results/jpeg_roundtrip.json
python -m lz4jpeg_tpu bench lz4t-decode --runs 6 --output results/lz4t_decode_device.json
python -m lz4jpeg_tpu bench jpeg-inverse --runs 10 --output results/jpeg_inverse_device.json
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m lz4jpeg_tpu bench scaling --runs 5 --output results/scaling_cpu8.json
echo ALL SWEEPS DONE
