"""Hard ultra-scale probe: 1M-point LOW-OVERLAP + CLUTTER registration
(VERDICT r3 #7 — proves the banded engine's capture loss at 1M points
is survivable off the symmetric full-overlap sphere).

Fixture: P and Q are partial views of one bumpy-sphere model sharing
only a band (~``overlap`` of Q); Q additionally carries a DISJOINT
clutter structure (a second bumpy sphere, different bump harmonics,
centered 4 diameters away) that can never register against P. The
expected LCP is therefore ~ the true overlap fraction, and the success
gate is the reference's pose thresholds rot<=0.2 / tr<=0.1
(ref:tests/matching.cc:333-335) via sequence.reference_pose_diff —
NOT the LCP value itself.

Usage: python tools/ultra_hard.py [seed=5] [n_points=1000000] [k=v ...]
Prints one JSON line.
"""
import _path  # noqa: F401  (repo root on sys.path)
import json
import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.cli import parse_tpu_opts
from super4pcs_tpu.sequence import reference_pose_diff

kv = dict(item.split("=", 1) for item in sys.argv[1:])
seed = int(kv.pop("seed", 5))
n = int(kv.pop("n_points", 1_000_000))
delta = float(kv.pop("delta", 0.005))
nq = int(kv.pop("nq", 16384))
budget = int(kv.pop("budget", 600))
overlap = float(kv.pop("overlap", 0.3))
over = parse_tpu_opts(",".join(f"{k}={v}" for k, v in kv.items())) if kv else {}


def bumpy(rng, m, a=0.3, b=5, c=3, d=0.2, e=4):
    v = rng.normal(size=(m, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1 + a * np.sin(b * v[:, 0]) * np.cos(c * v[:, 1])
            + d * np.sin(e * v[:, 2]))
    return (v * bump[:, None]).astype(np.float32)


rng = np.random.default_rng(0)
# one model; P and Q windows overlap only in a band (window cuts on the
# model's x axis BEFORE the pose is applied to Q), and Q is diluted
# with disjoint clutter down to the target overlap fraction.
model = bumpy(rng, int(n * 2.2))
x = model[:, 0]
p_full = model[x <= 0.25]
q_main = model[(x >= -0.02) & (x <= 0.62)]  # shared: x in [-0.02, 0.25]
q_shared = q_main[:, 0] <= 0.25
# clutter sized so shared/(len(q_main)+clutter) == overlap
n_clut = max(int(len(q_main) * (q_shared.mean() / overlap - 1.0)), 0)
clutter = bumpy(rng, max(n_clut, 1), a=0.5, b=9, c=7, d=0.3, e=11) * 0.8
clutter = clutter[:n_clut]
clutter[:, 0] += 4.0                 # disjoint: 4 diameters away
q_src = np.concatenate([q_main, clutter])
q_shared = np.concatenate([q_shared, np.zeros(n_clut, bool)])

# cap both clouds at n points (P keeps its window; Q keeps proportions)
p_pos = p_full[rng.permutation(len(p_full))[:n]]
keep = rng.permutation(len(q_src))[:n]
q_src, q_shared = q_src[keep], q_shared[keep]
true_overlap = float(q_shared.mean())

th = 0.8
rot = np.array([[np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
t_gt = np.float32([0.1, -0.05, 0.2])
q_pos = (q_src @ rot.T + t_gt).astype(np.float32)
q_pos += rng.normal(scale=delta / 5, size=q_pos.shape).astype(np.float32)

# ground truth maps Q back onto P: inverse of the applied pose
gt = np.eye(4, dtype=np.float32)
gt[:3, :3] = rot.T
gt[:3, 3] = -rot.T @ t_gt

opts = (Options(delta=delta, sample_size=nq, max_time_seconds=budget,
                random_seed=seed, **over)
        .configure_overlap(max(true_overlap - 0.03, 0.1),
                           terminate_threshold=max(true_overlap - 0.03,
                                                   0.1)))
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=p_pos), PointCloud(pos=q_pos))

rot_diff, tr_diff = reference_pose_diff(res.transform, gt)
print(json.dumps({
    "n_points": n, "delta": delta, "nq": nq, "seed": seed,
    "true_overlap": round(true_overlap, 4),
    "lcp": round(res.score, 4), "trials": res.n_trials,
    "search_s": round(res.stats["search_seconds"], 2),
    "compile_s": round(res.stats["compile_seconds"], 1),
    "escalated": res.stats.get("escalated_to"),
    "rot_diff": round(rot_diff, 4), "tr_diff": round(tr_diff, 4),
    "pose_pass": bool(rot_diff <= 0.2 and tr_diff <= 0.1),
    "pairs_ovf": int(res.stats["pairs_overflow"]),
    "cell_dropped": int(res.stats["cell_dropped"]),
    "q_sampled_out": int(res.stats.get("q_sampled_out", 0)),
}))
