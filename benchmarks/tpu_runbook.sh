#!/bin/bash
# TPU measurement runbook: every benchmark in priority order, each step
# independently timeboxed so a wedged tunnel still leaves earlier artifacts
# committed.  Run from the repo root, on an otherwise-idle machine (CPU load
# starves the tunnel's host dispatch thread and poisons timings).
set -x
cd "$(dirname "$0")/.."

# 1. KKT backend shootout (scan / pariccati / pallas)
timeout 3600 python benchmarks/bench_kkt.py --batches 1024 2048 8192 \
    --out benchmarks/results_kkt.json

# 2. Full-solve driver x KKT-backend A/B
timeout 5400 python benchmarks/bench_ab.py --batches 1024 4096 \
    --out benchmarks/results_ab.json

# 3. Honest per-stage profile + linearize formulation study
timeout 3600 python benchmarks/profile_stages.py --batches 1024,4096 \
    --variants > benchmarks/results_stages.jsonl

# 4. Linearize-mode full-solve A/B (same-process interleaved; the only
#    decision-grade comparison on this drifting tunnel)
timeout 3000 python benchmarks/bench_lin_modes.py --batch 1024 \
    --out benchmarks/results_lin_modes_1024.json
timeout 3600 python benchmarks/bench_lin_modes.py --batch 4096 \
    --out benchmarks/results_lin_modes_4096.json

# 5. The seven configs + batch-1 latency decomposition
timeout 7200 python benchmarks/run_all.py --out benchmarks/results_tpu.json

# 6. Headline
timeout 3600 python bench.py | tail -1 | tee benchmarks/headline_latest.json

# 7. Long-horizon backend crossover (N=512, scan vs pariccati)
timeout 3600 python benchmarks/bench_kkt.py --n 512 --nx 4 --nu 2 \
    --batches 16 128 --out benchmarks/results_kkt_n512.json

# 8. Fused-kernel vs lanes same-process A/B ladder (round 4; merges rungs
#    into benchmarks/results_fused.json)
FUSED_BATCHES=1024,4096 timeout 3600 python benchmarks/bench_fused.py
FUSED_BATCHES=16384,65536 FUSED_ROUNDS=8 timeout 3600 python benchmarks/bench_fused.py
FUSED_BATCHES=131072 FUSED_ROUNDS=8 timeout 3600 python benchmarks/bench_fused.py

# 8b. LTV production-service end-to-end check (config 6 through
#     BatchModelControl.step with the jitted relinearize)
timeout 1800 python benchmarks/bench_ltv_service.py

# 8c. Round-5 adaptive-kernel A/B campaign: cold continuation vs lanes,
#     adaptive vs fixed warm, N=50/N=100 rows, LTV at 4096 (merges into
#     benchmarks/results_fused.json)
timeout 3000 python benchmarks/bench_round5.py

# 8d. On-TPU fused test tier: the parity pins at the production (8,128)
#     tile with Mosaic lowering (round-4 VERDICT item 8) — a recorded
#     pass, not just the bench preamble sentinel
timeout 3600 python -m pytest tests_tpu/ -q | tee benchmarks/results_tpu_tests.txt

# 9. Scaling-efficiency artifact (1-chip row here; on a pod this records
#    the real multi-chip rows).  scaling_report now times whatever
#    make_sharded_solver resolves to — the fused adaptive kernel on TPU —
#    under the bench.py warm regime, so the pod one-liner records the
#    production path (round-4 VERDICT item 4).
timeout 1800 python benchmarks/bench_scaling.py

# 10. Regenerate the published section strictly from the artifacts above
python benchmarks/publish.py --headline-from benchmarks/headline_latest.json
