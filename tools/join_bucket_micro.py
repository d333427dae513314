"""Join grouping-primitive shootout (VERDICT r3 #3 groundwork).

The grid join's per-base cost is dominated by ONE primitive: grouping
K1 hashed table rows so that w^3-window probes can enumerate their
cell's members. Today that is a fused bitonic sort of K1 + 2*QB*w^3
packed keys (ops/congruent.py) — measured memory-bound at ~6% of HBM
peak with 16x headroom at nq=32768 (join 3.4 s of a 5.7 s step).

Candidates, each vmapped over B bases like the real step:
  sort      — the current pattern: lax.sort of (key, iota) over
              K1 + 2*QB*w^3 rows (boundary queries fused in).
  compact   — masked_indices-compact the valid rows (fill fraction f)
              first, then sort K1*f + queries.
  scatter   — NO sort: dense (M, T) cell table built by R rounds of
              last-write-wins scatter (slot chosen by a per-round hash),
              plus one scatter-add for exact per-cell counts (drop
              telemetry). Probes then index table[cell] directly.

Usage: python tools/join_bucket_micro.py [k1=1310720] [b=8] [fill=0.4]
Prints one JSON line per variant. Defaults are deliberately 1/4 of the
production nq=32768 shape: the primitives' RELATIVE cost is shape-stable
and a 16x5.2M-row sort is a >20-min cold compile over the tunnel.
"""
import _path  # noqa: F401
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from super4pcs_tpu.matcher import _enable_compilation_cache
from super4pcs_tpu.ops.masking import masked_indices

_enable_compilation_cache()

kv = dict(item.split("=", 1) for item in sys.argv[1:])
K1 = int(kv.get("k1", 1_310_720))
B = int(kv.get("b", 8))
FILL = float(kv.get("fill", 0.4))
QB = int(kv.get("qb", 8192))
W3 = 8
M = int(kv.get("m", 131072))          # dense-table cells (power of 2)
T = int(kv.get("t", 16))              # slots per cell
R = int(kv.get("r", 4))               # scatter rounds
N2Q = QB * W3

rng = np.random.default_rng(0)
# synthetic hashed keys: valid rows get a cell hash, invalid rows the
# sentinel (sorts to the tail), roughly FILL valid — the real layout
hashes = rng.integers(0, 1 << 28, size=(B, K1), dtype=np.int32)
valid = rng.random((B, K1)) < FILL
keys_np = np.where(valid, hashes, np.int32(2147483647))
qcells = rng.integers(0, 1 << 28, size=(B, N2Q), dtype=np.int32)

d_keys = jnp.asarray(keys_np)
d_q = jnp.asarray(qcells)


def timed(name, fn, *args):
    # completion via scalar FETCH: block_until_ready returns early on
    # the tunneled backend (measured: a 16x5.2M-row sort "completing"
    # in 0.1 ms), so a device_get of the reduced output is the only
    # trustworthy completion barrier here
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(f(*args))                            # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"variant": name, "best_s": round(min(ts), 4),
                      "med_s": round(sorted(ts)[1], 4)}), flush=True)


# --- sort: the current fused pattern --------------------------------
def sort_join(keys, q):
    def per_base(k, qc):
        total = K1 + 2 * N2Q
        allk = jnp.concatenate([k | 1, qc & ~jnp.int32(1),
                                (qc & ~jnp.int32(1)) + 2])
        sk, order = jax.lax.sort(
            (allk, jnp.arange(total, dtype=jnp.int32)), num_keys=1)
        return sk[::4096].sum() + order[::4096].sum()
    return jax.vmap(per_base)(keys, q)


# --- compact-then-sort ----------------------------------------------
CAP = int(K1 * min(FILL * 1.25, 1.0))


def compact_join(keys, q):
    def per_base(k, qc):
        sel, live, _ = masked_indices(k != 2147483647, CAP)
        ck = jnp.where(live, k[sel], jnp.int32(2147483647))
        total = CAP + 2 * N2Q
        allk = jnp.concatenate([ck | 1, qc & ~jnp.int32(1),
                                (qc & ~jnp.int32(1)) + 2])
        sk, order = jax.lax.sort(
            (allk, jnp.arange(total, dtype=jnp.int32)), num_keys=1)
        return sk[::4096].sum() + order[::4096].sum()
    return jax.vmap(per_base)(keys, q)


# --- scatter: dense capped cell table, no sort ----------------------
def scatter_join(keys, q):
    def per_base(k, qc):
        cell = (k & (M - 1)).astype(jnp.int32)
        is_valid = k != 2147483647
        # exact per-cell counts (drop telemetry)
        counts = jnp.zeros((M,), jnp.int32).at[
            jnp.where(is_valid, cell, M - 1)].add(1, mode="drop")
        rows = jnp.arange(K1, dtype=jnp.int32)
        table = jnp.full((M * T,), -1, jnp.int32)
        for r in range(R):
            # per-round slot hash: collisions within a round lose to
            # last-write-wins; later rounds give losers fresh slots
            mult = np.int32(np.uint32(2654435761 + r * 40503))
            slot = ((k * mult) >> 7) % T
            tgt = jnp.where(is_valid, cell * T + slot, M * T)
            table = table.at[tgt].set(rows, mode="drop")
        # probe: gather T slots per query cell (the join's L gathers)
        qcell = (qc & (M - 1)).astype(jnp.int32)
        probe = table.reshape(M, T)[qcell]          # (N2Q, T)
        return probe.sum() + counts[::512].sum()
    return jax.vmap(per_base)(keys, q)


print(json.dumps({"k1": K1, "b": B, "fill": FILL, "qb": QB, "m": M,
                  "t": T, "r": R, "backend": jax.default_backend()}),
      flush=True)
timed("sort", sort_join, d_keys, d_q)
timed("compact", compact_join, d_keys, d_q)
timed("scatter", scatter_join, d_keys, d_q)
