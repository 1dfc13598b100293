"""Collect round-4 evidence into one JSON for RESULTS_r4.json.

Pulls together: the garden ladder row (quality/rate), mid-run evals,
skip counts, the bench A/B matrix, 2DGS/10M bench JSONs, the dyn RD
table, and the exchange-cap sweep.
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(p):
    try:
        with open(p) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    out = {}
    g = os.path.join(ROOT, "results/garden_ladder_r4/cap_360000")
    stats = _load(os.path.join(g, "stats.json"))
    if stats:
        out["garden_cap360k"] = stats
    evals = {}
    for p in sorted(glob.glob(os.path.join(g, "stats/*.json"))):
        evals[os.path.basename(p)[:-5]] = _load(p)
    if evals:
        out["garden_cap360k_evals"] = evals
    for name, p in [
        ("bench_packed_logcomp", "results/r4_evidence/bench_packed_logcomp.json"),
        ("bench_2dgs", "results/r4_evidence/bench_2dgs.json"),
        ("bench_10m", "results/r4_evidence/bench_10m.json"),
        ("garden_ab_bf16", "results/garden_ab_bf16/stats.json"),
        ("garden_ab_f32", "results/garden_ab_f32/stats.json"),
        ("benchmark_2dgs", "results/garden_2dgs/stats.json"),
        ("dyn_rd_table", "results/dyn_stand_in/rd_table.json"),
        ("exchange_cap_sweep", "results/exchange_cap_sweep.json"),
    ]:
        d = _load(os.path.join(ROOT, p))
        if d is not None:
            out[name] = d
    with open(os.path.join(ROOT, "RESULTS_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: bool(v) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
