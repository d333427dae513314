"""Pair-engine comparison at large nq (VERDICT r2 #4 evidence).

Times the telescoped phase probes (select+extract / join / fit) and the
full production step for the rowcap vs banded engines at a given nq on
the current backend. The banded engine's claim: extraction work scales
with the output (the in-band candidates), not Theta(nq^2).

Usage: python tools/band_scale_bench.py [nq=32768] [n_points=200000]
Prints one JSON line.
"""
import _path  # noqa: F401
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from super4pcs_tpu import Options
from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.matcher import (_enable_compilation_cache,
                                   build_phase_probes, build_step,
                                   resolve_bases_per_step)

_enable_compilation_cache()
from super4pcs_tpu.ops import geometry, sampling
from super4pcs_tpu.ops.band_extract import build_band_index

kv = dict(item.split("=", 1) for item in sys.argv[1:])
NQ = int(kv.get("nq", 32768))
N = int(kv.get("n_points", 200_000))
DELTA = float(kv.get("delta", 0.008))
REPS = 3

rng = np.random.default_rng(0)
v = rng.normal(size=(N, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
pos = (v * bump[:, None]).astype(np.float32)
q = pos + rng.normal(scale=DELTA / 5, size=pos.shape).astype(np.float32)

FILTERS = kv.get("filters") == "1"
fkw = (dict(max_normal_difference=20.0, max_color_distance=60.0)
       if FILTERS else {})
opts0 = Options(delta=DELTA, sample_size=NQ, p_sample_budget=131072,
                **fkw).configure_overlap(0.7, 0.7)
sp = sampling.sample_for_matching(PointCloud(pos=pos), DELTA, NQ,
                                  truncate=False,
                                  rng=np.random.default_rng(1))
sq = sampling.sample_for_matching(PointCloud(pos=q), DELTA, NQ,
                                  truncate=True,
                                  rng=np.random.default_rng(1))
p_np = (sp.pos - sp.pos.mean(0)).astype(np.float32)
if len(p_np) > 131072:
    p_np = p_np[np.random.default_rng(2).permutation(len(p_np))[:131072]]
q_np = (sq.pos - sq.pos.mean(0)).astype(np.float32)
# production parity: matcher._init kd-orders Q (arms the Pallas
# kernel's tile rejection, r5)
q_np = q_np[sampling.kd_argsort(q_np)]
pp = jnp.asarray(p_np)
qp = jnp.asarray(q_np)
if FILTERS:
    # synthetic unit normals + colors so the filters BIND (zero
    # normals / -1 rgb would escape every predicate)
    rngf = np.random.default_rng(3)
    def _nrm(n):
        x = rngf.normal(size=(n, 3)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)
    zp = jnp.asarray(_nrm(len(p_np)))
    ip = jnp.asarray(rngf.uniform(0, 255, (len(p_np), 3)).astype(np.float32))
    zq = jnp.asarray(_nrm(len(q_np)))
    iq = jnp.asarray(rngf.uniform(0, 255, (len(q_np), 3)).astype(np.float32))
else:
    zp, ip = jnp.zeros_like(pp), jnp.full_like(pp, -1.0)
    zq, iq = jnp.zeros_like(qp), jnp.full_like(qp, -1.0)
nq = int(qp.shape[0])
diam = jnp.float32(geometry.estimate_diameter(
    q_np, 1000, np.random.default_rng(2)))

b = resolve_bases_per_step(opts0, nq)


def _args(i):
    # fresh keys per repetition: identical remote executions can be
    # served from a cache on the tunneled backend (measured: a 5.8 s
    # step "repeating" in 0.2 ms), which silently voids the timing
    return (jax.random.split(jax.random.key(i), b), diam,
            pp, zp, ip, qp, zq, iq)


def best_of(fn):
    # fetch a scalar each rep — completion, not enqueue
    float(jnp.sum(jax.tree.leaves(fn(*_args(0)))[0]))   # compile+warm
    best = float("inf")
    for i in range(1, REPS + 1):
        t0 = time.perf_counter()
        float(jnp.sum(jax.tree.leaves(fn(*_args(i)))[0]))
        best = min(best, time.perf_counter() - t0)
    return best


ENGINES = tuple(kv.get("engines", "rowcap,banded").split(","))

out = {"nq": nq, "np": int(pp.shape[0]), "delta": DELTA, "bases": b,
       "backend": jax.default_backend(), "engines": {}}
for engine in ENGINES:
    opts = opts0.replace(pair_engine=engine, bases_per_step=b)
    bidx = None
    if engine == "banded":
        t0 = time.perf_counter()
        bidx = build_band_index(q_np, DELTA)
        jax.block_until_ready(bidx.sorted_pair)
        build_s = time.perf_counter() - t0
    probes = build_phase_probes(opts, nq, 0.3, band_index=bidx)
    step, _ = build_step(opts, nq, 0.3, band_index=bidx)

    def timed(name, fn):
        # stream each phase as it lands: a timed-out run (cold compiles
        # + tunnel RPC stalls routinely eat 10s of minutes) still
        # yields the phases it measured
        t = best_of(jax.jit(fn))
        print(json.dumps({"engine": engine, "phase": name,
                          "s": round(t, 3)}), flush=True)
        return t

    t_ex = timed("extract", probes["extract"])
    if kv.get("phases") == "extract":
        # extract-only mode: racing extraction variants (e.g. the
        # SUPER4PCS_TPU_BAND_PICK modes) doesn't need the downstream
        # probes — join/fit/verify consume the same (pairs, valid)
        # shapes regardless, and each telescoped probe is a ~10-min
        # cold compile at nq=32768
        if bidx is not None:
            out["engines"][engine] = {
                "select_extract_s": round(t_ex, 3),
                "index_build_s": round(build_s, 3)}
        continue
    t_jn = timed("join", probes["join"])
    t_ft = timed("fit", probes["fit"])
    t_full = timed("full_step", step)
    row = {"select_extract_s": round(t_ex, 3),
           "join_s": round(max(t_jn - t_ex, 0), 3),
           "fit_s": round(max(t_ft - t_jn, 0), 3),
           "verify_s": round(max(t_full - t_ft, 0), 3),
           "step_s": round(t_full, 3),
           "trials_per_s": round(b / t_full, 2)}
    if bidx is not None:
        row["index_build_s"] = round(build_s, 3)
        row["band_cells"] = bidx.m
        row["cell_size"] = round(float(bidx.g), 5)
        row["pc"] = bidx.pc
        row["member_dropped"] = bidx.member_dropped
    out["engines"][engine] = row

print(json.dumps(out))
