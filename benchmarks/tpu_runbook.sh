#!/bin/bash
# Round-3 TPU measurement runbook: runs every TPU benchmark in priority
# order, each step independently timeboxed so a wedged tunnel still leaves
# the earlier artifacts committed.  Run from the repo root.
set -x
cd "$(dirname "$0")/.."

# 1. KKT shootout incl. the v2 sublanes kernel (the flagship question:
#    does batch-in-sublanes beat the v1 lanes kernel?)
timeout 3600 python benchmarks/bench_kkt.py --batches 1024 2048 8192 \
    --out benchmarks/results_kkt.json

# 2. Full-solve A/B: solver x backend (promote-or-delete solve_batch_tpu)
timeout 5400 python benchmarks/bench_ab.py --batches 1024 4096 \
    --out benchmarks/results_ab.json

# 3. Honest per-stage profile, config 4 at 256 and 4096
timeout 3600 python benchmarks/profile_stages.py --batches 256,4096 \
    > benchmarks/results_stages.jsonl

# 4. The seven configs + batch-1 latency + fixed-program decomposition
timeout 7200 python benchmarks/run_all.py \
    --out benchmarks/results_tpu.json

# 5. Headline (auto backend)
timeout 3600 python bench.py | tee /tmp/bench_headline.jsonl

# 6. Long-horizon backend crossover (N=512 synthetic, scan vs pariccati)
timeout 3600 python benchmarks/bench_kkt.py --n 512 --nx 4 --nu 2 \
    --batches 16 128 --out benchmarks/results_kkt_n512.json

# 7. Regenerate the published section from the artifacts above
python benchmarks/publish.py
