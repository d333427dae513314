"""Host-side probe of band-index geometry at the 32k bench operating
point: how many sorted-table entries fall in the annulus for typical
base-edge lengths, and how many REAL candidate pairs (sum of occupancy
products) they expand to. Sizes the banded engine's window/budget.

Usage: python tools/band_probe.py [nq=32768] [n_points=200000] [delta=0.008]
"""
import _path  # noqa: F401
import json
import math
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.ops import sampling
from super4pcs_tpu.ops.band_extract import build_band_index

kv = dict(item.split("=", 1) for item in sys.argv[1:])
NQ = int(kv.get("nq", 32768))
N = int(kv.get("n_points", 200_000))
DELTA = float(kv.get("delta", 0.008))

rng = np.random.default_rng(0)
v = rng.normal(size=(N, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
pos = (v * bump[:, None]).astype(np.float32)
q = pos + rng.normal(scale=DELTA / 5, size=pos.shape).astype(np.float32)
sq = sampling.sample_for_matching(PointCloud(pos=q), DELTA, NQ,
                                  truncate=True,
                                  rng=np.random.default_rng(1))
q_np = (sq.pos - sq.pos.mean(0)).astype(np.float32)

idx = build_band_index(q_np, DELTA)
centers = np.asarray(idx.centers)
occ = np.asarray(idx.occ).astype(np.int64)
m = idx.m
d = np.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1)
dflat = d.reshape(-1)
order = np.argsort(dflat)
dsort = dflat[order]
prod = (occ[:, None] * occ[None, :]).reshape(-1)[order]
prod_cum = np.concatenate([[0], np.cumsum(prod)])

eps = 2 * DELTA  # DISTANCE_FACTOR * delta
slack = eps + math.sqrt(3) * idx.g
diam = float(np.linalg.norm(q_np.max(0) - q_np.min(0)))
rows = []
for frac in (0.1, 0.25, 0.5, 0.7, 0.9):
    dist = frac * diam * 0.5  # typical base edges ~ overlap * diameter
    lo = np.searchsorted(dsort, dist - slack)
    hi = np.searchsorted(dsort, dist + slack)
    rows.append({
        "edge_d": round(dist, 4),
        "span": int(hi - lo),
        "real_candidates": int(prod_cum[hi] - prod_cum[lo]),
    })
print(json.dumps({
    "nq": int(q_np.shape[0]), "m": m, "pc": idx.pc, "g": round(idx.g, 5),
    "occ_mean": round(float(occ.mean()), 2),
    "occ_p90": int(np.percentile(occ, 90)),
    "occ_max": int(occ.max()),
    "member_dropped": idx.member_dropped,
    "diam": round(diam, 3),
    "table": m * m,
    "bands": rows,
}))
