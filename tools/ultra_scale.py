"""Ultra-scale probe: 1M-point noisy pair registration on the real TPU
(BASELINE.json config #5 upper end, "100k-1M-pt scans").

Point spacing at 1M points on the bumpy sphere is ~0.0035, so
delta=0.005 keeps the sampler's voxel at the data's resolving power
(BASELINE.md note: delta must scale with sampling density). nq=16384
doubles the fine-delta table (known join-sort scaling wall, ROADMAP
item 4).

Usage: python tools/ultra_scale.py [seed=5] [k=v ...]
Prints one JSON line.
"""
import _path  # noqa: F401  (repo root on sys.path)
import json
import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.cli import parse_tpu_opts

kv = dict(item.split("=", 1) for item in sys.argv[1:])
seed = int(kv.pop("seed", 5))
n = int(kv.pop("n_points", 1_000_000))
delta = float(kv.pop("delta", 0.005))
nq = int(kv.pop("nq", 16384))
budget = int(kv.pop("budget", 300))
over = parse_tpu_opts(",".join(f"{k}={v}" for k, v in kv.items())) if kv else {}

rng = np.random.default_rng(0)
v = rng.normal(size=(n, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
        + 0.2 * np.sin(4 * v[:, 2]))
pos = (v * bump[:, None]).astype(np.float32)
th = 0.8
rot = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
q = (pos @ rot.T + np.float32([0.1, -0.05, 0.2])).astype(np.float32)
q += rng.normal(scale=delta / 5, size=q.shape).astype(np.float32)

opts = (Options(delta=delta, sample_size=nq, max_time_seconds=budget,
                random_seed=seed, **over)
        .configure_overlap(0.70, terminate_threshold=0.70))
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q))

moved = res.transformed_q.pos if res.transformed_q is not None else q
sub = rng.choice(n, 2000, replace=False)
d = np.linalg.norm(
    moved[sub][:, None, :] - pos[rng.choice(n, 20000, replace=False)][None],
    axis=-1).min(1)
print(json.dumps({
    "n_points": n, "delta": delta, "nq": nq, "seed": seed,
    "lcp": round(res.score, 4), "trials": res.n_trials,
    "search_s": round(res.stats["search_seconds"], 2),
    "compile_s": round(res.stats["compile_seconds"], 1),
    "escalated": res.stats.get("escalated_to"),
    "median_err": round(float(np.median(d)), 5),
    "pairs_ovf": int(res.stats["pairs_overflow"]),
    "cell_dropped": int(res.stats["cell_dropped"]),
    "cands_ovf": int(res.stats["cands_overflow"]),
    "n_congruent": int(res.stats["n_congruent"]),
}))
