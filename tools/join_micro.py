"""Per-stage timing of find_congruent_quads_grid at the fine-delta
operating point (nq=8192, row_cap=160 -> K1=1.31M, QB=8192, L=16,
16 bases vmapped). Mirrors the production code (layout path, no valid
payload column); timing fetches results to host (block_until_ready is
not a reliable fence on the tunneled backend).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from super4pcs_tpu.matcher import _enable_compilation_cache
from super4pcs_tpu.ops import congruent
from super4pcs_tpu.ops.masking import masked_indices

NQ = 8192
ROW_CAP = 160
K1 = NQ * ROW_CAP
QB = 8192
L = 16
B = 16
CAP = 4096
R = 0.013


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (NQ, 3)).astype(np.float32)
    rows = np.repeat(np.arange(NQ, dtype=np.int32), ROW_CAP)
    cols = rng.integers(0, NQ, (B, K1), dtype=np.int32)
    pairs1 = np.stack([np.broadcast_to(rows, (B, K1)), cols], axis=-1)
    valid1 = rng.uniform(size=(B, K1)) < 0.5
    pairs2 = rng.integers(0, NQ, (B, QB, 2), dtype=np.int32)
    valid2 = rng.uniform(size=(B, QB)) < 0.9
    inv1 = rng.uniform(0.2, 0.8, (B,)).astype(np.float32)
    inv2 = rng.uniform(0.2, 0.8, (B,)).astype(np.float32)
    cosa = rng.uniform(-0.5, 0.5, (B,)).astype(np.float32)
    return [jnp.asarray(x) for x in
            (pos, pairs1, valid1, pairs2, valid2, inv1, inv2, cosa)]


def stage_fn(stage):
    def one(pos, pairs1, valid1, pairs2, valid2, inv1, inv2, cosa):
        r = R
        cell = 2.0 * r
        k1 = pairs1.shape[0]
        n_rows = k1 // ROW_CAP
        p1 = pos[jnp.minimum(jnp.arange(n_rows), pos.shape[0] - 1)]
        a1 = jnp.broadcast_to(p1[:, None, :],
                              (n_rows, ROW_CAP, 3)).reshape(k1, 3)
        b1 = pos[pairs1[:, 1]]
        e1 = a1 + inv1 * (b1 - a1)
        cells1 = jnp.floor(e1 / cell).astype(jnp.int32)
        h1 = congruent._cell_hash(cells1)
        h1 = jnp.where(valid1, h1, jnp.int32(2147483647))
        d1 = b1 - a1
        dir1 = d1 / jnp.maximum(
            jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-30)
        if stage == "hash":
            return h1.sum() + e1.sum() + dir1.sum()
        unpacked = jnp.concatenate([e1, dir1], axis=1)
        nc = unpacked.shape[1]
        sorted_ops = jax.lax.sort(
            (h1,) + tuple(unpacked[:, c] for c in range(nc))
            + (jnp.arange(k1, dtype=jnp.int32),), num_keys=1)
        h1s = sorted_ops[0]
        packed = jnp.stack(sorted_ops[1:1 + nc], axis=0)
        order = sorted_ops[-1]
        if stage == "sort":
            return h1s.sum() + packed.sum() + order.sum()
        qb = QB
        sel2, sel2_valid, n2 = masked_indices(valid2, qb)
        pairs2b = pairs2[sel2]
        a2 = pos[pairs2b[:, 0]]
        b2 = pos[pairs2b[:, 1]]
        e2 = a2 + inv2 * (b2 - a2)
        base_cell = jnp.floor((e2 - r) / cell).astype(jnp.int32)
        probe = base_cell[:, None, :] + jnp.asarray(congruent._CORNER_OFFSETS)
        hq = congruent._cell_hash(probe)
        hq_flat = hq.reshape(-1)
        both = jnp.searchsorted(
            h1s, jnp.concatenate([hq_flat, hq_flat + 1]),
            side='left', method='sort')
        lo = both[:hq_flat.shape[0]].reshape(qb, 8)
        hi = both[hq_flat.shape[0]:].reshape(qb, 8)
        if stage == "searchsorted":
            return lo.sum() + hi.sum() + packed.sum()
        counts = jnp.where(sel2_valid[:, None], hi - lo, 0)
        lo_c = lo.reshape(-1)
        hi_c = jnp.where(sel2_valid[:, None], hi, lo).reshape(-1)
        pvalid = jnp.repeat(sel2_valid, 8)
        qi = jnp.arange(qb * 8, dtype=jnp.int32) // 8
        slot = lo_c[:, None] + jnp.arange(L, dtype=lo.dtype)
        in_cell = (slot < hi_c[:, None]) & pvalid[:, None]
        slot = jnp.clip(slot, 0, k1 - 1)
        g = packed[:, slot]
        if stage == "gather":
            return g.sum() + counts.sum()
        e2_c = e2[qi].T
        d2 = jnp.sum((g[:3] - e2_c[:, :, None]) ** 2, axis=0)
        mask = in_cell & (d2 <= r * r)
        d2v = b2 - a2
        dir2 = d2v / jnp.maximum(
            jnp.linalg.norm(d2v, axis=-1, keepdims=True), 1e-30)
        cos12 = jnp.sum(g[3:6] * dir2[qi].T[:, :, None], axis=0)
        mask &= jnp.abs(cos12 - cosa) <= 0.02
        if stage == "validate":
            return mask.sum()
        sel, valid, count = masked_indices(mask.reshape(-1), CAP)
        q1 = pairs1[order[slot.reshape(-1)[sel]]]
        q2 = pairs2b[qi[sel // L]]
        quads = jnp.concatenate([q1, q2], axis=-1)
        return quads.sum() + count

    def step(pos, p1, v1, p2, v2, i1, i2, ca):
        return jax.vmap(
            lambda *a: one(pos, *a))(p1, v1, p2, v2, i1, i2, ca)
    return jax.jit(step)


def main():
    _enable_compilation_cache()
    args = make_inputs(0)
    for a in args:
        a.block_until_ready()
    prev = 0.0
    for stage in ["hash", "sort", "searchsorted", "gather", "validate",
                  "full"]:
        fn = stage_fn(stage)
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        t = min(ts) * 1e3
        print(f"{stage:14s} {t:8.1f} ms  (+{t - prev:7.1f})  "
              f"[compile {compile_s:.0f}s]", flush=True)
        prev = t


if __name__ == "__main__":
    main()
