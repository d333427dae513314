"""End-to-end registration at nq=32768: engine / capacity comparison.

time-to-LCP>=0.7 on a 200k-point noisy pair for (engine, max_pairs)
combinations — the registration-level evidence for the banded engine
and for how much pair-capture capacity large-nq quality actually needs
(the join's per-base sort pays linearly for capacity).

Usage: python tools/scale32k_e2e.py [seed=5] [budget=300]
Prints one JSON line per configuration.
"""
import _path  # noqa: F401
import json
import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud

kv = dict(item.split("=", 1) for item in sys.argv[1:])
seed = int(kv.get("seed", 5))
budget = int(kv.get("budget", 300))
NQ = int(kv.get("nq", 32768))
DELTA = float(kv.get("delta", 0.008))

rng = np.random.default_rng(0)
n = 200_000
v = rng.normal(size=(n, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
pos = (v * bump[:, None]).astype(np.float32)
th = 0.8
rot = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
q = (pos @ rot.T + np.float32([0.1, -0.05, 0.2])).astype(np.float32)
q += rng.normal(scale=DELTA / 5, size=q.shape).astype(np.float32)
P, Q = PointCloud(pos=pos), PointCloud(pos=q)

configs = [
    {"pair_engine": "rowcap"},
    {"pair_engine": "banded"},
    {"pair_engine": "banded", "max_pairs": 16 * NQ},
    {"pair_engine": "rowcap", "max_pairs": 16 * NQ},
]
if "engines" in kv:          # e.g. engines=banded runs only those rows
    wanted = kv["engines"].split(",")
    configs = [c for c in configs if c["pair_engine"] in wanted]
for extra in configs:
    opts = (Options(delta=DELTA, sample_size=NQ, max_time_seconds=budget,
                    p_sample_budget=131072, random_seed=seed, **extra)
            .configure_overlap(0.7, terminate_threshold=0.7))
    res = MatchSuper4PCS(opts).compute_transformation(P, Q)
    print(json.dumps({
        **extra,
        "lcp": round(res.score, 4), "trials": res.n_trials,
        "search_s": round(res.stats["search_seconds"], 2),
        "compile_s": round(res.stats.get("compile_seconds", 0), 1),
        "pairs_ovf": int(res.stats["pairs_overflow"]),
        "cell_dropped": int(res.stats["cell_dropped"]),
        "band_cells": res.stats.get("band_cells"),
    }), flush=True)
