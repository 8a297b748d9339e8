#!/bin/bash
# Hardware measurement blitz: run the moment the axon tunnel is up.
# Usage: bash scripts/hw_blitz.sh [outfile]   (default /tmp/hw_blitz.log)
# Step 0 is the 30-second kernel smoke gate (scripts/pallas_hw_check.py) —
# it runs FIRST every session so the Pallas kernels can never silently rot
# against the live Mosaic toolchain (the round-3 check did exactly that).
set -u
OUT="${1:-/tmp/hw_blitz.log}"
cd "$(dirname "$0")/.."
{
  echo "=== hw_blitz $(date -u +%FT%TZ) ==="
  echo "--- 0. kernel smoke gate (MUST pass before anything else) ---"
  timeout 600 python scripts/pallas_hw_check.py || exit 1

  echo "--- 1. devices ---"
  timeout 120 python -c "import jax; print(jax.devices())" || exit 1

  echo "--- 2. pallas engine per-stage probe (128^3 / 4.1M) ---"
  timeout 3000 python scripts/pallas_engine_probe.py

  echo "--- 3. bench: pallas engine (committed defaults) ---"
  BENCH_ENGINE=pallas timeout 4000 python bench.py

  echo "--- 3a. bench: pallas + split_terms=2 ---"
  BENCH_ENGINE=pallas BENCH_SPLIT_TERMS=2 timeout 4000 python bench.py

  echo "--- 3b. bench: pallas + kernel pushback + sdf cap 8 ---"
  BENCH_ENGINE=pallas BENCH_PUSHBACK=kernel BENCH_SDF_CAPACITY=8 \
    timeout 4000 python bench.py

  echo "--- 3c. bench: pallas + stale pass A (resort 1/frame) ---"
  BENCH_ENGINE=pallas BENCH_PASS_A=stale timeout 4000 python bench.py

  echo "--- 3e. bench: pallas + bf16 gather columns ---"
  BENCH_ENGINE=pallas BENCH_GATHER_DTYPE=bf16 timeout 4000 python bench.py

  echo "--- 3f. bench: pallas + split_terms=2 + bf16 gather (candidate default) ---"
  BENCH_ENGINE=pallas BENCH_SPLIT_TERMS=2 BENCH_GATHER_DTYPE=bf16 \
    timeout 4000 python bench.py

  echo "--- 3d. solver microbench (direct solve wall, 128^3) ---"
  RES=128 timeout 4000 python scripts/solver_microbench.py

  echo "--- 4. bench: table engine (round-2 reference point) ---"
  BENCH_ENGINE=table timeout 4000 python bench.py

  echo "--- 5. now compare the steps/s above and write the winner ---"
  echo "    echo <engine> > BENCH_DEFAULT && git commit"
  echo "=== done ==="
} 2>&1 | tee "$OUT"
