"""Measure what bases-axis sharding buys (VERDICT r2 #7).

Two honest measurements — this image has ONE host core, so the
8-virtual-device CPU mesh serializes all shards (measured: 2014 s for
one mesh=8 x B=16 step at nq=1024 that plain jit runs in ~1/8 the
work-time) and "trials/s vs mesh size" on it is meaningless:

  tpu: the single-chip vmap-width curve (trials/s vs bases_per_step) —
       the real signal for what per-device step width buys; mesh
       scaling multiplies it by the device count minus the overheads
       measured below.
  cpu: OVERHEAD deltas at equal per-device work on the virtual mesh,
       where shared-core serialization cancels out: (a) plain jit vs
       one-device shard_map (wrapper cost), (b) mesh=8 gather_telemetry
       on vs off (the per-base telemetry all_gather — the one step
       output that grows with B x mesh).

Usage:
  python tools/sharding_throughput.py tpu [nq=1024]
  python tools/sharding_throughput.py cpu [nq=256]
Prints one JSON line per row as it completes, then a summary line.
"""
import _path  # noqa: F401
import json
import sys
import time

backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
kv = dict(item.split("=", 1) for item in sys.argv[2:])
if backend == "cpu":
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
import jax
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from super4pcs_tpu import Options
from super4pcs_tpu.matcher import _enable_compilation_cache, build_step

_enable_compilation_cache()
from super4pcs_tpu.ops import sampling, geometry
from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.parallel import make_mesh
from super4pcs_tpu.parallel.sharded import sharded_step

NQ = int(kv.get("nq", 256 if backend == "cpu" else 1024))
REPS = 2

rng = np.random.default_rng(0)
v = rng.normal(size=(20000, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
pos = (v * bump[:, None]).astype(np.float32)
q = pos + rng.normal(scale=0.004, size=pos.shape).astype(np.float32)

opts0 = Options(delta=0.02, sample_size=NQ).configure_overlap(0.7, 0.7)
sp = sampling.sample_for_matching(PointCloud(pos=pos), opts0.delta,
                                  NQ, truncate=False,
                                  rng=np.random.default_rng(1))
sq = sampling.sample_for_matching(PointCloud(pos=q), opts0.delta,
                                  NQ, truncate=True,
                                  rng=np.random.default_rng(1))
pp = jnp.asarray(sp.pos - sp.pos.mean(0), jnp.float32)
qp = jnp.asarray(sq.pos - sq.pos.mean(0), jnp.float32)
zeros_p = jnp.zeros_like(pp)
negs_p = jnp.full_like(pp, -1.0)
zeros_q = jnp.zeros_like(qp)
negs_q = jnp.full_like(qp, -1.0)
nq = int(qp.shape[0])
diam = jnp.float32(geometry.estimate_diameter(
    np.asarray(qp), 1000, np.random.default_rng(2)))


def time_step(fn, keys_of):
    """``keys_of(i)`` -> per-rep key batch. Fresh keys per rep + a
    scalar fetch per rep: identical remote executions can be cached on
    the tunneled backend and block_until_ready measures enqueue, not
    completion, without a result pull."""
    def run(i):
        args = (keys_of(i), diam, pp, zeros_p, negs_p, qp, zeros_q,
                negs_q)
        return float(jnp.sum(jax.tree.leaves(fn(*args))[0]))
    run(0)                                    # compile + warm
    best = float("inf")
    for i in range(1, REPS + 1):
        t0 = time.perf_counter()
        run(i)
        best = min(best, time.perf_counter() - t0)
    return best


out = {"backend": backend, "nq": nq, "rows": []}

if backend == "cpu":
    devs = jax.devices()
    B = 16
    opts = opts0.replace(bases_per_step=B)
    step, _ = build_step(opts, nq, 0.3)

    def keys_for(mesh):
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("bases"))
        return lambda i, sh=sh: jax.device_put(
            jax.random.split(jax.random.key(i), B), sh)

    # (a) wrapper cost: plain jit vs one-device shard_map, equal B
    t_jit = time_step(jax.jit(step),
                      lambda i: jax.random.split(jax.random.key(i), B))
    row = {"case": "jit", "mesh": 1, "bases": B, "step_s": round(t_jit, 4)}
    print(json.dumps(row), flush=True)
    out["rows"].append(row)
    mesh1 = make_mesh(devs[:1])
    t_sm = time_step(sharded_step(step, mesh1), keys_for(mesh1))
    row = {"case": "shard_map", "mesh": 1, "bases": B,
           "step_s": round(t_sm, 4)}
    print(json.dumps(row), flush=True)
    out["rows"].append(row)
    out["wrapper_overhead_s"] = round(t_sm - t_jit, 4)

    # (b) telemetry-gather cost: mesh=8 with the per-base pair_counts
    # table all_gathered in-step vs returned as a sharded leaf
    mesh8 = make_mesh(devs)
    for gt in (True, False):
        dt = time_step(
            sharded_step(step, mesh8, gather_telemetry=gt),
            keys_for(mesh8))
        row = {"case": f"mesh8_gather={gt}", "mesh": 8, "bases": B,
               "step_s": round(dt, 4)}
        print(json.dumps(row), flush=True)
        out["rows"].append(row)
    out["telemetry_gather_overhead_s"] = round(
        out["rows"][-2]["step_s"] - out["rows"][-1]["step_s"], 4)
else:
    # single real chip: vmap width curve (throughput vs bases_per_step)
    for b in (8, 16, 32, 64, 128):
        opts = opts0.replace(bases_per_step=b)
        step, _ = build_step(opts, nq, 0.3)
        dt = time_step(
            jax.jit(step),
            lambda i, b=b: jax.random.split(jax.random.key(i), b))
        row = {"bases": b, "step_s": round(dt, 4),
               "trials_per_s": round(b / dt, 1)}
        print(json.dumps(row), flush=True)
        out["rows"].append(row)

print(json.dumps(out))
