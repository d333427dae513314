"""Measure what bases-axis sharding buys (VERDICT r2 #7).

Step throughput (trials/s) vs bases_per_step x mesh size on the
virtual 8-device CPU mesh, plus the single-chip vmap-width curve when
run on the real TPU. Also isolates the per-step collective cost of the
sharded wrapper (all_gather of the tiny result dict + per-base
telemetry) by comparing one-device shard_map vs plain jit at equal B.

Usage:
  python tools/sharding_throughput.py cpu    # 8 virtual devices
  python tools/sharding_throughput.py tpu    # 1 real chip, vmap widths
Prints one JSON line.
"""
import _path  # noqa: F401
import json
import sys
import time

backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
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
from super4pcs_tpu.matcher import build_step
from super4pcs_tpu.ops import sampling, geometry
from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.parallel import make_mesh
from super4pcs_tpu.parallel.sharded import sharded_step

NQ = 1024          # mid-scale: per-step work large enough to matter
                   # (2048 made the CPU-mesh table take hours)
REPS = 3

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
    for mesh_n in (1, 2, 4, 8):
        for b in (16, 64):
            if b % mesh_n:
                continue
            opts = opts0.replace(bases_per_step=b)
            step, _ = build_step(opts, nq, 0.3)
            mesh = make_mesh(devs[:mesh_n])
            fn = sharded_step(step, mesh)
            sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("bases"))
            keys_of = lambda i, b=b, sh=sh: jax.device_put(
                jax.random.split(jax.random.key(i), b), sh)
            dt = time_step(fn, keys_of)
            out["rows"].append({"mesh": mesh_n, "bases": b,
                                "step_s": round(dt, 4),
                                "trials_per_s": round(b / dt, 1)})
    # collective overhead: plain jit vs 1-device shard_map at B=16
    opts = opts0.replace(bases_per_step=16)
    step, _ = build_step(opts, nq, 0.3)
    t_jit = time_step(jax.jit(step),
                      lambda i: jax.random.split(jax.random.key(i), 16))
    mesh = make_mesh(devs[:1])
    sh1 = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("bases"))
    t_sm = time_step(
        sharded_step(step, mesh),
        lambda i: jax.device_put(
            jax.random.split(jax.random.key(i), 16), sh1))
    out["collective_overhead_s"] = round(t_sm - t_jit, 4)
    out["jit_step_s"] = round(t_jit, 4)
else:
    # single real chip: vmap width curve (throughput vs bases_per_step)
    for b in (8, 16, 32, 64, 128):
        opts = opts0.replace(bases_per_step=b)
        step, _ = build_step(opts, nq, 0.3)
        dt = time_step(
            jax.jit(step),
            lambda i, b=b: jax.random.split(jax.random.key(i), b))
        out["rows"].append({"bases": b, "step_s": round(dt, 4),
                            "trials_per_s": round(b / dt, 1)})

print(json.dumps(out))
