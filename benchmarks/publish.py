#!/usr/bin/env python
"""Regenerate BASELINE.json's ``published`` section from committed artifacts.

Round-2 VERDICT item 4 (one source of truth): every published number must be
traceable to exactly one committed results file.  This script derives the
whole ``published`` block from:

- ``benchmarks/results_tpu.json``  (run_all.py --out, the six configs)
- ``benchmarks/results_kkt.json``  (bench_kkt.py, KKT backend shootout)
- ``benchmarks/results_ab.json``   (bench_ab.py, solver x backend A/B)
- ``BENCH_r*.json``                (driver-run bench.py headline), via
  --headline-from pointing at the newest one

and refuses to invent anything: a missing artifact leaves its section out.

Usage: python benchmarks/publish.py [--headline-from BENCH_r03.json]
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    p = os.path.join(ROOT, path)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--headline-from", default=None,
                    help="BENCH_r*.json (driver record) or a bench.py "
                         "headline JSON file")
    args = ap.parse_args()

    baseline = _load("BASELINE.json")
    pub = {
        "note": "Every number below is copied verbatim from one committed "
                "artifact, named per entry. The reference publishes no "
                "numbers; its implied envelope is ~250 warm IPOPT solves/s "
                "on a 2021 desktop CPU (BASELINE.md).",
        "timing_note": "All artifacts use chained timing ending in a scalar "
                       "device->host pull: on the remote-dispatch backend "
                       "jax.block_until_ready returns at enqueue, so "
                       "unchained loops overreport.",
    }

    tpu = _load("benchmarks/results_tpu.json")
    if tpu:
        pub["device"] = tpu.get("device")
        pub["configs"] = tpu["configs"]
        pub["configs_source"] = "benchmarks/results_tpu.json"

    kkt = _load("benchmarks/results_kkt.json")
    if kkt:
        best = {}
        for row in kkt.get("rows", []):
            if "error" in row:
                continue
            b = row["batch"]
            if b not in best or row["solves_per_s"] > best[b]["solves_per_s"]:
                best[b] = row
        pub["kkt_kernel"] = {
            "source": "benchmarks/results_kkt.json",
            "best_backend_per_batch": {
                str(b): {"backend": r["backend"],
                         "solves_per_s": r["solves_per_s"],
                         "ms": r["ms"],
                         "pct_of_bandwidth_bound":
                             r["pct_of_bandwidth_bound"]}
                for b, r in sorted(best.items())},
        }

    ab = _load("benchmarks/results_ab.json")
    if ab:
        ok = [r for r in ab.get("rows", []) if "error" not in r]
        if ok:
            win = max(ok, key=lambda r: r["solves_per_s"])
            pub["production_solver"] = {
                "source": "benchmarks/results_ab.json",
                "winner": {k: win[k] for k in
                           ("solver", "kkt", "batch", "solves_per_s",
                            "warm_ms", "mean_iters", "max_iters",
                            "converged_frac")},
            }

    fused = _load("benchmarks/results_fused.json")
    if fused:
        rows = fused.get("results", {})
        # N=25 warm ladder rows are keyed by batch size; round-5 A/B rows
        # (cold_*, n50_*, n100_*, ltv_*, adaptive_*) are keyed by regime.
        ladder = {b: r for b, r in rows.items() if b.isdigit()}
        extra = {b: r for b, r in rows.items() if not b.isdigit()}
        if ladder:
            best_b = max(ladder,
                         key=lambda b: ladder[b]["fused_solves_per_s"])
            pub["fused_kernel"] = {
                "source": "benchmarks/results_fused.json",
                "peak": {"batch": int(best_b), **ladder[best_b]},
                "per_batch_solves_per_s": {
                    b: ladder[b]["fused_solves_per_s"] for b in sorted(
                        ladder, key=int)},
            }
        if extra:
            pub.setdefault("fused_kernel", {})["round5_ab_rows"] = extra

    scaling = _load("benchmarks/results_scaling.json")
    if scaling:
        pub["scaling"] = {"source": "benchmarks/results_scaling.json",
                          **scaling}

    if args.headline_from:
        h = _load(args.headline_from)
        if h:
            parsed = h.get("parsed", h)  # BENCH_r*.json wraps under "parsed"
            pub["headline_solves_per_s_per_chip"] = parsed.get("value")
            pub["headline_config"] = parsed.get("metric")
            pub["headline_source"] = args.headline_from
            if parsed.get("value"):
                pub["vs_reference_envelope"] = round(
                    parsed["value"] / 250.0, 1)

    baseline["published"] = pub
    out = os.path.join(ROOT, "BASELINE.json")
    with open(out, "w") as f:
        json.dump(baseline, f, indent=2)
    print("rewrote BASELINE.json published section from artifacts:",
          ", ".join(k for k in ("configs_source", "kkt_kernel",
                                "production_solver", "headline_source")
                    if k in pub or k in pub.get("kkt_kernel", {})))


if __name__ == "__main__":
    main()
