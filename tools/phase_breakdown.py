"""Phase breakdown + roofline attribution on the current backend
(VERDICT r3 #2 evidence: which phase is compute-, memory-, or
dispatch-bound, and the headroom to the v5e ceilings).

Runs a registration with Options.phase_timing and prints the measured
per-phase seconds joined with the analytic FLOPs/bytes model
(utils/roofline). Configs: the 100k fine-delta headline (nq=8192,
default) or the banded operating points (nq=32768 / 65536 via nq=...).

Usage: python tools/phase_breakdown.py [nq=8192] [n_points=100000]
       [engine=auto] [budget=60]
Prints one JSON line per run.
"""
import _path  # noqa: F401  (repo root on sys.path)
import json
import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud

kv = dict(item.split("=", 1) for item in sys.argv[1:])
NQ = int(kv.get("nq", 8192))
N = int(kv.get("n_points", 100_000 if NQ <= 8192 else 200_000))
DELTA = float(kv.get("delta", 0.01 if NQ <= 8192 else 0.008))
BUDGET = int(kv.get("budget", 60))
ENGINE = kv.get("engine", "auto")

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

extra = {} if ENGINE == "auto" else {"pair_engine": ENGINE}
opts = (Options(delta=DELTA, sample_size=NQ, max_time_seconds=BUDGET,
                random_seed=5, phase_timing=True,
                p_sample_budget=131072 if NQ > 8192 else None, **extra)
        .configure_overlap(0.70, terminate_threshold=0.70))
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q))
roof = res.stats.get("phase_roofline", {})
print(json.dumps({
    "nq": NQ, "n_points": N, "delta": DELTA, "engine": ENGINE,
    "lcp": round(res.score, 4),
    "search_s": round(res.stats["search_seconds"], 2),
    "phases": {k: round(v, 3) for k, v in
               res.stats["phase_seconds"].items()},
    "roofline": {k: {kk: (round(vv, 3) if isinstance(vv, float) else vv)
                     for kk, vv in r.items()} for k, r in roof.items()},
}))
