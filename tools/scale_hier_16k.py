"""VERDICT r5 #8 validation: hierarchical scale mode at nq=16384.

The BASELINE r3 scale fixture (s=1.4, noise 0.008, delta 0.05, seed 21)
scaled up to a 50k-point cloud sampled at 16384 — far beyond the nq^2
allpairs ceiling. Done = LCP >= 0.95 and scale error < 0.5%.

Usage: python tools/scale_hier_16k.py [nq=16384] [n=50000]
"""
import _path  # noqa: F401
import json
import sys
import time

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud

kv = dict(item.split("=", 1) for item in sys.argv[1:])
NQ = int(kv.get("nq", 16384))
N = int(kv.get("n", 50000))
S = 1.4

rng = np.random.default_rng(21)
v = rng.normal(size=(N, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
        + 0.2 * np.sin(4 * v[:, 2]))
pos = (v * bump[:, None]).astype(np.float32)
th = 0.8
rot = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
q = (((pos @ rot.T) + np.float32([0.1, -0.05, 0.2])) / S).astype(np.float32)
q += rng.normal(scale=0.008, size=q.shape).astype(np.float32)

opts = Options(delta=0.05, sample_size=NQ, max_time_seconds=240,
               estimate_scale=True, random_seed=21,
               ).configure_overlap(0.6, 0.9)
t0 = time.perf_counter()
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q))
wall = time.perf_counter() - t0
est = float(np.linalg.norm(res.transform[:3, :3], axis=0).mean())
moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
err = float(np.median(np.linalg.norm(moved - pos, axis=1)))
print(json.dumps({
    "nq": NQ, "lcp": round(res.score, 4), "scale_est": round(est, 5),
    "scale_err_pct": round(abs(est - S) / S * 100, 3),
    "median_err": round(err, 5), "trials": res.n_trials,
    "hier_scale": res.stats.get("hierarchical_scale"),
    "coarse_lcp": res.stats.get("coarse_lcp"),
    "coarse_s": res.stats.get("coarse_search_seconds"),
    "search_s": round(res.stats.get("search_seconds", -1), 2),
    "wall_s": round(wall, 1),
    "gate": bool(res.score >= 0.95 and abs(est - S) / S < 0.005)}))
