"""Calibrate the roofline VPU peak against a known-arithmetic kernel
(VERDICT r4 #6: utils/roofline.TPU_V5E.vpu_f32_flops was an
order-of-magnitude estimate; the percent-of-peak columns BASELINE.md
quotes inherit its error bar).

The probe is the Pallas LCP kernel at a shape where its FLOPs dominate
everything else: ``lcp_scores_pallas(C transforms, nq queries, np
points)`` does exactly 8 f32 VPU ops per (candidate, q, p) triple —
3 subs + 3 mul-adds (6) + min, plus the transform applied per (c, q)
(amortized out at large np) — the same count the step cost model uses
(matcher._step_costs). The kernel was independently measured at ~100%
of the old estimate, so the calibrated number doubles as a check that
the estimate was not wildly off.

Usage: python tools/vpu_calibrate.py [c=64] [nq=1024] [np=300000]
Prints one JSON line: achieved TFLOP/s = the calibrated VPU f32 peak
floor (a lower bound: the kernel's own overheads only subtract).
"""
import _path  # noqa: F401
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from super4pcs_tpu.matcher import _enable_compilation_cache
from super4pcs_tpu.kernels import lcp_pallas

_enable_compilation_cache()

kv = dict(item.split("=", 1) for item in sys.argv[1:])
C = int(kv.get("c", 64))
NQ = int(kv.get("nq", 1024))
NP = int(kv.get("np", 300_000))

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(NQ, 3)).astype(np.float32))
p = jnp.asarray(rng.normal(size=(NP, 3)).astype(np.float32))
tr = jnp.asarray(
    np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    + 0.01 * rng.normal(size=(C, 4, 4)).astype(np.float32))

fn = jax.jit(lambda t, qq, pp: jnp.sum(
    lcp_pallas.lcp_scores_pallas(t, qq, pp, jnp.float32(0.05))))
float(fn(tr, q, p))            # compile + warm
best = float("inf")
for i in range(5):
    t0 = time.perf_counter()
    float(fn(tr, q, p))
    best = min(best, time.perf_counter() - t0)

flops = 8.0 * C * NQ * NP
print(json.dumps({
    "c": C, "nq": NQ, "np": NP, "best_s": round(best, 4),
    "achieved_tflops": round(flops / best / 1e12, 3),
    "old_estimate_tflops": 3.5,
    "backend": jax.default_backend()}))
