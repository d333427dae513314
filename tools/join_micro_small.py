"""Per-stage timing of the grid join at the hippo (toy) operating
point: nq=200, dense-path pairs (K1=3200), QB=3200, 16 bases vmapped.
Diagnoses the small-scale join cost that dominates hippo steps."""
import _path  # noqa: F401  (repo root on sys.path)
import time

import jax
import jax.numpy as jnp
import numpy as np

from super4pcs_tpu.matcher import _enable_compilation_cache
from super4pcs_tpu.ops import congruent

NQ = 200
K1 = 3200
QB = 3200
B = 16
CAP = 1664
R = 0.026
CELL = 0.052


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (NQ, 3)).astype(np.float32)
    pairs1 = rng.integers(0, NQ, (B, K1, 2), dtype=np.int32)
    valid1 = rng.uniform(size=(B, K1)) < 0.5
    pairs2 = rng.integers(0, NQ, (B, K1, 2), dtype=np.int32)
    valid2 = rng.uniform(size=(B, K1)) < 0.5
    inv1 = rng.uniform(0.2, 0.8, (B,)).astype(np.float32)
    inv2 = rng.uniform(0.2, 0.8, (B,)).astype(np.float32)
    cosa = rng.uniform(-0.5, 0.5, (B,)).astype(np.float32)
    return [jnp.asarray(x) for x in
            (pos, pairs1, valid1, pairs2, valid2, inv1, inv2, cosa)]


def stage_fn(stage):
    from super4pcs_tpu.ops.masking import masked_indices

    def one(pos, pairs1, valid1, pairs2, valid2, inv1, inv2, cosa):
        r = R
        cell = CELL
        k1 = pairs1.shape[0]
        L = 16
        rows1 = pairs1[:, 0]
        cols1 = pairs1[:, 1]

        def e1_components(rows, cols):
            out = []
            for c in range(3):
                pc = pos[:, c]
                ac = pc[rows]
                bc = pc[cols]
                out.append((ac, bc, ac + inv1 * (bc - ac)))
            return out

        e1c = [e for (_, _, e) in e1_components(rows1, cols1)]
        h1 = (jnp.floor(e1c[0] / cell).astype(jnp.int32) * congruent._HP1) \
            ^ (jnp.floor(e1c[1] / cell).astype(jnp.int32) * congruent._HP2) \
            ^ (jnp.floor(e1c[2] / cell).astype(jnp.int32) * congruent._HP3)
        h1 = jnp.where(valid1, h1, jnp.int32(2147483647))
        if stage == "hash":
            return h1.sum()
        qb = QB
        sel2, sel2_valid, n2 = masked_indices(valid2, qb)
        pairs2b = pairs2[sel2]
        a2 = pos[pairs2b[:, 0]]
        b2 = pos[pairs2b[:, 1]]
        e2 = a2 + inv2 * (b2 - a2)
        base_cell = jnp.floor((e2 - r) / cell).astype(jnp.int32)
        probe = base_cell[:, None, :] + jnp.asarray(
            congruent._window_offsets(2))
        hq_flat = congruent._cell_hash(probe).reshape(-1)
        n2q = hq_flat.shape[0]
        total = k1 + 2 * n2q
        group1 = h1 & ~jnp.int32(1)
        groupq = hq_flat & ~jnp.int32(1)
        keys = jnp.concatenate([group1 | 1, groupq, groupq + 2])
        sk, order = jax.lax.sort(
            (keys, jnp.arange(total, dtype=jnp.int32)), num_keys=1)
        if stage == "sort":
            return sk.sum() + order.sum()
        is_table = (sk & 1) == 1
        posn = jnp.arange(total, dtype=jnp.int32)
        nt = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(is_table, posn, total))))
        ctab = jnp.cumsum(is_table.astype(jnp.int32)) \
            - is_table.astype(jnp.int32)
        ctab = jnp.concatenate([ctab, jnp.full((1,), k1, jnp.int32)])
        qtarget = jnp.where(is_table, 2 * n2q, order - k1)
        bpos = jnp.zeros(2 * n2q, jnp.int32).at[qtarget].set(
            nt, mode="drop")
        lo_c = bpos[:n2q]
        hi_all = bpos[n2q:]
        pvalid = jnp.repeat(sel2_valid, 8)
        counts = jnp.where(pvalid,
                           jnp.maximum(ctab[hi_all] - ctab[lo_c], 0), 0)
        hi_c = jnp.where(pvalid, hi_all, lo_c)
        if stage == "boundaries":
            return lo_c.sum() + hi_c.sum() + counts.sum()
        qi = jnp.arange(qb * 8, dtype=jnp.int32) // 8
        slot = lo_c[:, None] + jnp.arange(L, dtype=lo_c.dtype)
        in_cell = (slot < hi_c[:, None]) & pvalid[:, None]
        slot = jnp.clip(slot, 0, total - 1)
        in_cell &= (sk[slot] & 1) == 1
        orid = jnp.minimum(order[slot], k1 - 1)
        trow = rows1[orid]
        tcol = cols1[orid]
        if stage == "gather":
            return orid.sum() + trow.sum() + tcol.sum() + counts.sum()
        e2_c = e2[qi].T
        g = e1_components(trow, tcol)
        d2 = sum((ec - e2_c[c][:, None]) ** 2
                 for c, (_, _, ec) in enumerate(g))
        mask = in_cell & (d2 <= r * r)
        d2v = b2 - a2
        dir2 = d2v / jnp.maximum(
            jnp.linalg.norm(d2v, axis=-1, keepdims=True), 1e-30)
        dxc = [bc - ac for (ac, bc, _) in g]
        n1g = jnp.maximum(jnp.sqrt(
            dxc[0] ** 2 + dxc[1] ** 2 + dxc[2] ** 2), 1e-30)
        d2q = dir2[qi]
        cos12 = (dxc[0] * d2q[:, 0, None] + dxc[1] * d2q[:, 1, None]
                 + dxc[2] * d2q[:, 2, None]) / n1g
        mask &= jnp.abs(cos12 - cosa) <= 0.3
        if stage == "validate":
            return mask.sum()
        sel, valid, count = masked_indices(mask.reshape(-1), CAP)
        orid_sel = orid.reshape(-1)[sel]
        q1 = jnp.stack([rows1[orid_sel], cols1[orid_sel]], axis=-1)
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
    for stage in ["hash", "sort", "boundaries", "gather", "validate",
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
        print(f"{stage:12s} {t:8.1f} ms  (+{t - prev:7.1f})  "
              f"[compile {compile_s:.0f}s]", flush=True)
        prev = t


if __name__ == "__main__":
    main()
