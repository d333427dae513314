"""Round-5 join-phase cost attribution for the CURRENT grid join.

Replicates ops/congruent.find_congruent_quads_grid's post-r4 pipeline
(cols-only row-cap table, table-only sort, vectorized binary-searched
ranges) as CUMULATIVE prefixes at production shapes, to locate where
the measured ~4 s join at nq=32768 actually goes (VERDICT r5 item #1).

  hash      — e1 components from broadcast + cols gather, cell hash
  sort      — + jax.lax.sort((group, iota)) over the K1 table
  bsearch   — + the 2*N2Q-probe vectorized binary search
  pcompact  — + probe compaction (masked_indices n2q -> PB)
  gather    — + (L, PB) slot expansion, order/cols gathers
  validate  — + e1 recompute from pos, distance+cone masks, final
               masked_indices(capacity)

Usage: python tools/join5_micro.py [nq=32768] [b=16] [row_cap=192]
Prints one JSON line per prefix; deltas are the phase costs. Timing is
through a reduced-output scalar fetch (the only trustworthy barrier on
the tunneled backend).
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
ROW_CAP = int(kv.get("row_cap", 192))
QB = int(kv.get("qb", 8192))
L = int(kv.get("l", 16))
NPROBE = int(kv.get("nprobe", 8))
PB = int(kv.get("pb", 2 * QB * NPROBE // 8))
CAPACITY = int(kv.get("capacity", 8320))
FILL = float(kv.get("fill", 0.4))
K1 = NQ * ROW_CAP
N2Q = QB * NPROBE

_HP1, _HP2, _HP3 = 73856093, 19349669, 83492791
R = 0.016
CELL = 0.032
INV1 = 0.37

rng = np.random.default_rng(0)
pos_np = rng.normal(size=(NQ, 3)).astype(np.float32)
cols_np = rng.integers(0, NQ, size=(B, K1), dtype=np.int32)
valid_np = rng.random((B, K1)) < FILL
e2_np = rng.normal(size=(B, QB, 3)).astype(np.float32)

d = dict(pos=jnp.asarray(pos_np), cols=jnp.asarray(cols_np),
         valid=jnp.asarray(valid_np), e2=jnp.asarray(e2_np))


def pipeline(stop, pos, cols_all, valid_all, e2_all):
    n_rows = K1 // ROW_CAP
    row_clamp = jnp.minimum(jnp.arange(n_rows), NQ - 1)

    def per_base(cols1, valid1, e2):
        # r5: h1 arrives precomputed from the capture kernel; model it
        # as a cheap elementwise derivation so the hash stage is ~free
        h1 = jnp.where(valid1, cols1 * jnp.int32(_HP1),
                       jnp.int32(2147483647))
        if stop == "hash":
            return h1[::4096].sum()

        group1 = h1 & ~jnp.int32(1)
        sk, order = jax.lax.sort(
            (group1, jnp.arange(K1, dtype=jnp.int32)), num_keys=1)
        if stop == "sort":
            return sk[::4096].sum() + order[::4096].sum()

        MIN32 = jnp.int32(-2147483648)
        nblk = (K1 + 63) // 64
        sk_s = sk[63::64]
        buck_s = jax.lax.shift_right_logical(sk_s ^ MIN32, 16)
        firstb = jnp.concatenate(
            [jnp.ones((1,), bool), buck_s[1:] != buck_s[:-1]])
        fi, fv, _ = masked_indices(firstb, min(65536, nblk))
        tgt = jnp.where(fv, buck_s[fi], 65536)
        starts = jnp.full((65537,), nblk, jnp.int32).at[tgt].min(
            jnp.where(fv, fi, nblk), mode="drop")
        jb = jnp.flip(jax.lax.cummin(jnp.flip(starts)))
        slo = jnp.int32(0); shi = jnp.int32(K1)
        for _ in range(max(K1.bit_length(), 1)):
            mid = (slo + shi) >> 1
            go = sk[jnp.minimum(mid, K1 - 1)] < jnp.int32(2147483646)
            slo = jnp.where(go, mid + 1, slo)
            shi = jnp.where(go, shi, mid)
        if stop == "bucket":
            return jb[::512].sum() + slo

        base_cell = jnp.floor((e2 - R) / CELL).astype(jnp.int32)
        offs = np.array([(i, j, k) for i in range(2) for j in range(2)
                         for k in range(2)], dtype=np.int32)
        probe = base_cell[:, None, :] + jnp.asarray(offs)
        hq_flat = ((probe[..., 0] * _HP1) ^ (probe[..., 1] * _HP2)
                   ^ (probe[..., 2] * _HP3)).reshape(-1)
        groupq = hq_flat & ~jnp.int32(1)
        vals = jnp.concatenate([groupq, groupq + 2])
        bq = jax.lax.shift_right_logical(vals ^ MIN32, 16)
        lo_b = jnp.minimum(64 * jb[bq], slo)
        hi_b = jnp.minimum(jnp.minimum(64 * jb[bq + 1] + 64, K1), slo)
        rounds = min(max(K1.bit_length(), 1),
                     max(12, (K1 >> 16).bit_length() + 5))
        for _ in range(rounds):
            mid = (lo_b + hi_b) >> 1
            go = sk[jnp.minimum(mid, K1 - 1)] < vals
            lo_b = jnp.where(go, mid + 1, lo_b)
            hi_b = jnp.where(go, hi_b, mid)
        lo_c = lo_b[:N2Q]
        hi_all = lo_b[N2Q:]
        if stop == "bsearch":
            return lo_c[::512].sum() + hi_all[::512].sum()

        counts = jnp.maximum(hi_all - lo_c, 0)
        hi_c = hi_all
        pmask = hi_c > lo_c
        psel, psv, _ = masked_indices(pmask, PB)
        lo_cc = lo_c[psel]
        hi_cc = jnp.where(psv, hi_c[psel], lo_cc)
        qi = psel // NPROBE
        if stop == "pcompact":
            return lo_cc[::64].sum() + hi_cc[::64].sum() + qi[::64].sum()

        slot = lo_cc[None, :] + jnp.arange(L, dtype=jnp.int32)[:, None]
        in_cell = (slot < hi_cc[None, :]) & psv[None, :]
        slot = jnp.clip(slot, 0, K1 - 1)
        orid = jnp.minimum(order[slot], K1 - 1)
        trow = jnp.minimum(orid // ROW_CAP, NQ - 1)
        tcol = cols1[orid]
        if stop == "gather":
            return (orid[::8, ::64].sum() + tcol[::8, ::64].sum()
                    + in_cell[::8, ::64].sum() + trow[::8, ::64].sum())

        e2_c = e2[qi].T
        d2 = jnp.zeros_like(e2_c[0][None, :])
        dxc = []
        for c in range(3):
            pc = pos[:, c]
            ac = pc[trow]
            bc = pc[tcol]
            ec = ac + INV1 * (bc - ac)
            d2 = d2 + (ec - e2_c[c][None, :]) ** 2
            dxc.append(bc - ac)
        mask = in_cell & (d2 <= R * R)
        n1g = jnp.maximum(jnp.sqrt(
            dxc[0] ** 2 + dxc[1] ** 2 + dxc[2] ** 2), 1e-30)
        # cone mask vs a fixed probe direction (shape-faithful stand-in)
        d2q = e2[qi]
        cos12 = (dxc[0] * d2q.T[0][None, :] + dxc[1] * d2q.T[1][None, :]
                 + dxc[2] * d2q.T[2][None, :]) / n1g
        mask &= jnp.abs(cos12 - 0.5) <= 0.1
        sel, vv, cnt = masked_indices(mask.reshape(-1), CAPACITY)
        return sel[::64].sum() + vv[::64].sum() + cnt

    return jax.vmap(per_base)(cols_all, valid_all, e2_all)


def timed(name):
    f = jax.jit(lambda *a: jnp.sum(pipeline(name, *a)))
    args = (d["pos"], d["cols"], d["valid"], d["e2"])
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"prefix": name, "best_s": round(min(ts), 4)}),
          flush=True)


print(json.dumps({"nq": NQ, "b": B, "row_cap": ROW_CAP, "k1": K1,
                  "pb": PB, "l": L,
                  "backend": jax.default_backend()}), flush=True)
for name in ("hash", "sort", "bucket", "bsearch", "pcompact",
             "gather", "validate"):
    timed(name)
