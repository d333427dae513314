"""5-seed robustness at a large-nq operating point (VERDICT r3 #6:
the bench discipline applied where the newest engine code runs).

Registers a 200k/400k-point noisy pair at the given nq over 5 seeds
and reports the LCP / search-time / capture-telemetry distribution.

Usage: python tools/scale_seeds.py [nq=32768] [n_points=200000]
       [budget=120] [k=v ...]
Prints one JSON line per seed plus a summary line.
"""
import _path  # noqa: F401
import json
import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.cli import parse_tpu_opts

kv = dict(item.split("=", 1) for item in sys.argv[1:])
NQ = int(kv.pop("nq", 32768))
N = int(kv.pop("n_points", 200_000 if NQ <= 32768 else 400_000))
DELTA = float(kv.pop("delta", 0.008))
BUDGET = int(kv.pop("budget", 120))
SEEDS = tuple(int(s) for s in kv.pop("seeds", "1,3,5,7,11").split(","))
over = parse_tpu_opts(",".join(f"{k}={v}" for k, v in kv.items())) if kv else {}

rng = np.random.default_rng(0)
v = rng.normal(size=(N, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
        + 0.2 * np.sin(4 * v[:, 2]))
pos = (v * bump[:, None]).astype(np.float32)
th = 0.8
rot = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
q = (pos @ rot.T + np.float32([0.1, -0.05, 0.2])).astype(np.float32)
q += rng.normal(scale=DELTA / 5, size=q.shape).astype(np.float32)

rows = []
for seed in SEEDS:
    opts = (Options(delta=DELTA, sample_size=NQ, max_time_seconds=BUDGET,
                    p_sample_budget=131072, random_seed=seed, **over)
            .configure_overlap(0.70, terminate_threshold=0.70))
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    row = {"seed": seed, "lcp": round(res.score, 4),
           "trials": res.n_trials,
           "search_s": round(res.stats["search_seconds"], 2),
           "compile_s": round(res.stats["compile_seconds"], 1),
           "pairs_ovf": int(res.stats["pairs_overflow"]),
           "cell_dropped": int(res.stats["cell_dropped"]),
           "esc": res.stats.get("escalated_to")}
    rows.append(row)
    print(json.dumps(row), flush=True)

lcps = sorted(r["lcp"] for r in rows)
times = sorted(r["search_s"] for r in rows)
print(json.dumps({
    "nq": NQ, "n_points": N, "delta": DELTA, "budget": BUDGET,
    "seeds": list(SEEDS), "lcps": lcps, "search_s": times,
    "median_search_s": times[len(times) // 2],
    "worst_within_budget": times[-1] <= BUDGET,
    "all_above_0.7": all(x >= 0.70 for x in lcps),
}))
