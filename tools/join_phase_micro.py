"""Join-phase cost attribution (VERDICT r3 #3 groundwork, part 2).

join_bucket_micro.py showed the fused SORT is only ~0.4 s of the
measured 3.4 s join at nq=32768 — this tool replicates the rest of the
grid join's skeleton (ops/congruent.py find_congruent_quads_grid) at
production shapes, as CUMULATIVE pipeline prefixes, to locate the other
3 s:

  sort      — fused table+boundary-query sort (keys + iota payload)
  ranges    — + reverse-cummin next-table positions, table-rank cumsum,
               boundary scatter, per-probe counts
  pcompact  — + probe compaction (masked_indices over n2q -> PB)
  gather    — + the (L, PB) slot expansion and the big-table gathers
               (sorted key tag, order payload, cols1)
  validate  — + invariant-point recompute from pos, distance mask,
               final masked_indices(capacity)

Usage: python tools/join_phase_micro.py [nq=32768] [b=16] [row_cap=160]
Prints one JSON line per prefix; the deltas are the phase costs.
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
NQ = int(kv.get("nq", 32768))
B = int(kv.get("b", 16))
ROW_CAP = int(kv.get("row_cap", 160))
QB = int(kv.get("qb", 8192))
L = int(kv.get("l", 16))
PB = int(kv.get("pb", 2 * QB * 8 // 8))
CAPACITY = int(kv.get("capacity", 8192))
K1 = NQ * ROW_CAP
N2Q = QB * 8
TOTAL = K1 + 2 * N2Q
FILL = float(kv.get("fill", 0.4))

rng = np.random.default_rng(0)
hashes = rng.integers(0, 1 << 28, size=(B, K1), dtype=np.int32)
valid = rng.random((B, K1)) < FILL
keys_np = np.where(valid, hashes, np.int32(2147483647))
qcells = rng.integers(0, 1 << 28, size=(B, N2Q), dtype=np.int32)
pos_np = rng.normal(size=(NQ, 3)).astype(np.float32)
cols_np = rng.integers(0, NQ, size=(B, K1), dtype=np.int32)
e2_np = rng.normal(size=(B, QB, 3)).astype(np.float32)

d = dict(keys=jnp.asarray(keys_np), q=jnp.asarray(qcells),
         pos=jnp.asarray(pos_np), cols=jnp.asarray(cols_np),
         e2=jnp.asarray(e2_np))


def pipeline(stop, keys, q, pos, cols_all, e2_all):
    def per_base(k, qc, cols, e2):
        group1 = k & ~jnp.int32(1)
        groupq = qc & ~jnp.int32(1)
        allk = jnp.concatenate([group1 | 1, groupq, groupq + 2])
        sk, order = jax.lax.sort(
            (allk, jnp.arange(TOTAL, dtype=jnp.int32)), num_keys=1)
        if stop == "sort":
            return sk[::4096].sum() + order[::4096].sum()

        is_table = (sk & 1) == 1
        posn = jnp.arange(TOTAL, dtype=jnp.int32)
        nt = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(is_table, posn, TOTAL))))
        ctab = jnp.cumsum(is_table.astype(jnp.int32)) \
            - is_table.astype(jnp.int32)
        ctab = jnp.concatenate([ctab, jnp.full((1,), K1, jnp.int32)])
        qtarget = jnp.where(is_table, 2 * N2Q, order - K1)
        bpos = jnp.zeros(2 * N2Q, jnp.int32).at[qtarget].set(
            nt, mode="drop")
        lo_c = bpos[:N2Q]
        hi_all = bpos[N2Q:]
        counts = jnp.maximum(ctab[hi_all] - ctab[lo_c], 0)
        if stop == "ranges":
            return (lo_c[::512].sum() + hi_all[::512].sum()
                    + counts[::512].sum())

        pmask = hi_all > lo_c
        psel, psv, _ = masked_indices(pmask, PB)
        lo = lo_c[psel]
        hi = jnp.where(psv, hi_all[psel], lo)
        qi = psel // 8
        if stop == "pcompact":
            return lo[::64].sum() + hi[::64].sum() + qi[::64].sum()

        slot = lo[None, :] + jnp.arange(L, dtype=lo.dtype)[:, None]
        in_cell = (slot < hi[None, :]) & psv[None, :]
        slot = jnp.clip(slot, 0, TOTAL - 1)
        in_cell &= (sk[slot] & 1) == 1
        orid = jnp.minimum(order[slot], K1 - 1)
        trow = jnp.minimum(orid // ROW_CAP, NQ - 1)
        tcol = cols[orid]
        if stop == "gather":
            return (orid[::64, ::64].sum() + tcol[::64, ::64].sum()
                    + in_cell[::64, ::64].sum())

        # validate: e1 recompute from pos + distance mask + compaction
        inv1 = jnp.float32(0.37)
        r = jnp.float32(0.016)
        pa = pos[trow]               # (L, PB, 3)
        pb_ = pos[tcol]
        e1 = pa + inv1 * (pb_ - pa)
        e2g = e2[qi].T
        d2 = ((e1[..., 0] - e2g[0][None]) ** 2
              + (e1[..., 1] - e2g[1][None]) ** 2
              + (e1[..., 2] - e2g[2][None]) ** 2)
        mask = in_cell & (d2 <= r * r)
        sel, vv, cnt = masked_indices(mask.reshape(-1), CAPACITY)
        return sel[::64].sum() + vv[::64].sum() + cnt
    return jax.vmap(per_base)(keys, q, cols_all, e2_all)


def timed(name):
    f = jax.jit(lambda *a: jnp.sum(pipeline(name, *a)))
    args = (d["keys"], d["q"], d["pos"], d["cols"], d["e2"])
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"prefix": name, "best_s": round(min(ts), 4)}),
          flush=True)


print(json.dumps({"nq": NQ, "b": B, "k1": K1, "pb": PB, "l": L,
                  "backend": jax.default_backend()}), flush=True)
for name in ("sort", "ranges", "pcompact", "gather", "validate"):
    timed(name)
