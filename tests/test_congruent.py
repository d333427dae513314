"""Congruent-quad join tests: 4PCS-mode parity with a brute-force
oracle, and the Super4PCS cone filter as a subset of the 4PCS superset —
the assertion the reference's disabled quad_extraction test intended
(ref:tests/quad_extraction.cc:66-155, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from super4pcs_tpu.ops import congruent


def oracle_quads(pos, pairs1, pairs2, inv1, inv2, radius):
    """Brute-force re-derivation of ref:4pcs.cc:62-109 with the
    *corrected* threshold contract (squared distance vs squared radius;
    see ops/congruent.py module docstring for the deliberate divergence
    from the reference's squared-vs-raw quirk)."""
    out = set()
    for k1, (a, b) in enumerate(pairs1):
        e1 = pos[a] + inv1 * (pos[b] - pos[a])
        for k2, (c, d) in enumerate(pairs2):
            e2 = pos[c] + inv2 * (pos[d] - pos[c])
            if ((e1 - e2) ** 2).sum() <= radius * radius:
                out.add((a, b, c, d))
    return out


def make_pairs(rng, pos, k):
    n = len(pos)
    idx = rng.integers(0, n, size=(k, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    return idx.astype(np.int32)


def test_matches_oracle_4pcs_mode(rng):
    pos = rng.uniform(-1, 1, size=(80, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 50)
    pairs2 = make_pairs(rng, pos, 50)
    inv1, inv2 = 0.37, 0.61
    thr = 0.22

    quads, valid, count = congruent.find_congruent_quads(
        jnp.asarray(pos),
        jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
        jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
        inv1, inv2, thr, 0.0, -1.0, capacity=4096)
    got = {tuple(q) for q, v in zip(np.asarray(quads), np.asarray(valid))
           if v}
    expected = oracle_quads(pos, pairs1, pairs2, inv1, inv2, thr)
    assert got == expected
    assert int(count) == len(expected)


def test_super4pcs_subset_of_4pcs(rng):
    pos = rng.uniform(-1, 1, size=(80, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 60)
    pairs2 = make_pairs(rng, pos, 60)
    inv1, inv2 = 0.5, 0.5
    thr = 0.32
    args = (jnp.asarray(pos),
            jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
            jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
            inv1, inv2, thr, 0.25)
    q4, v4, _ = congruent.find_congruent_quads(
        *args, -1.0, capacity=8192)
    qs, vs, _ = congruent.find_congruent_quads(
        *args, 0.3, capacity=8192)
    set4 = {tuple(q) for q, v in zip(np.asarray(q4), np.asarray(v4)) if v}
    sets = {tuple(q) for q, v in zip(np.asarray(qs), np.asarray(vs)) if v}
    assert sets <= set4
    # the cone filter keeps exactly the direction-compatible candidates
    for (a, b, c, d) in set4:
        d1 = pos[b] - pos[a]
        d2 = pos[d] - pos[c]
        cos = np.dot(d1, d2) / (np.linalg.norm(d1) * np.linalg.norm(d2))
        if abs(cos - 0.25) <= 0.3 - 1e-5:
            assert (a, b, c, d) in sets


def test_invalid_pairs_excluded(rng):
    pos = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 10)
    valid1 = np.zeros(len(pairs1), bool)   # all dead slots
    pairs2 = make_pairs(rng, pos, 10)
    quads, valid, count = congruent.find_congruent_quads(
        jnp.asarray(pos), jnp.asarray(pairs1), jnp.asarray(valid1),
        jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
        0.5, 0.5, 100.0, 0.0, -1.0, capacity=64)
    assert int(count) == 0
    assert not bool(valid.any())


def test_grid_join_matches_dense(rng):
    """The sorted-hash grid join must reproduce the dense join exactly
    (the reference's own fast-vs-oracle testing pattern, SURVEY.md §4),
    up to per-cell cap overflow (none at these sizes)."""
    pos = rng.uniform(-1, 1, size=(120, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 300)
    pairs2 = make_pairs(rng, pos, 300)
    inv1, inv2 = 0.42, 0.58
    for thr, cone in ((0.15, -1.0), (0.15, 0.3), (0.4, 0.5)):
        args = (jnp.asarray(pos),
                jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
                jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
                inv1, inv2, thr, 0.25, cone)
        qd, vd, cd = congruent.find_congruent_quads(*args, capacity=16384)
        qg, vg, cg, dropped, _ = congruent.find_congruent_quads_grid(
            *args, capacity=16384, cell_candidates=64)
        dense = {tuple(x) for x, v in zip(np.asarray(qd), np.asarray(vd))
                 if v}
        grid = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg))
                if v}
        assert int(dropped) == 0
        assert grid == dense, (len(grid), len(dense))


def test_grid_join_windowed_cells_match_dense(rng):
    """With cell_size below 2 * radius (the coarse-search geometry:
    radius widened, cells kept at the exact-delta scale) the join
    probes a w^3 > 8 window; results must still equal the dense
    oracle exactly."""
    pos = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 250)
    pairs2 = make_pairs(rng, pos, 250)
    args = (jnp.asarray(pos),
            jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
            jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
            0.42, 0.58, 0.3, 0.25, 0.4)
    qd, vd, cd = congruent.find_congruent_quads(*args, capacity=16384)
    dense = {tuple(x) for x, v in zip(np.asarray(qd), np.asarray(vd))
             if v}
    for cell in (0.3, 0.2, 0.11):          # w = 3, 4, 7
        qg, vg, cg, dropped, _ = congruent.find_congruent_quads_grid(
            *args, capacity=16384, cell_candidates=64, cell_size=cell)
        grid = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg))
                if v}
        assert int(dropped) == 0
        assert grid == dense, (cell, len(grid), len(dense))


def test_grid_join_row_cap_layout_parity(rng):
    """With pairs1 in the row-capped capture layout (row i // row_cap),
    passing row_cap must be a pure optimization: identical quads, count
    and drop telemetry to the generic path, including padded rows
    (n_rows > len(pos)) which are invalid."""
    n, row_cap = 60, 4
    n_rows = 64                                    # 4 padded rows
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    rows = np.repeat(np.arange(n_rows, dtype=np.int32), row_cap)
    cols = rng.integers(0, n, size=(n_rows * row_cap,)).astype(np.int32)
    pairs1 = np.stack([rows, cols], axis=-1)
    valid1 = (rng.uniform(size=len(pairs1)) < 0.7) & (rows < n) \
        & (rows != cols)
    pairs2 = make_pairs(rng, pos, 200)
    for cone in (-1.0, 0.3):
        args = (jnp.asarray(pos),
                jnp.asarray(pairs1), jnp.asarray(valid1),
                jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
                0.42, 0.58, 0.15, 0.25, cone)
        qg, vg, cg, dg, _ = congruent.find_congruent_quads_grid(
            *args, capacity=16384, cell_candidates=64)
        ql, vl, cl, dl, _ = congruent.find_congruent_quads_grid(
            *args, capacity=16384, cell_candidates=64, row_cap=row_cap)
        generic = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg))
                   if v}
        layout = {tuple(x) for x, v in zip(np.asarray(ql), np.asarray(vl))
                  if v}
        assert layout == generic
        assert int(cl) == int(cg) and int(dl) == int(dg)


def test_grid_join_probe_budget(rng):
    """With an ample probe budget the compacted join is identical to
    the uncompacted one; with a tight budget the missed cells' entries
    are counted in dropped and the result stays a subset."""
    pos = rng.uniform(-1, 1, size=(120, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 300)
    pairs2 = make_pairs(rng, pos, 300)
    args = (jnp.asarray(pos),
            jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
            jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
            0.42, 0.58, 0.15, 0.25, 0.3)
    qg, vg, cg, dg, _ = congruent.find_congruent_quads_grid(
        *args, capacity=16384, cell_candidates=64)
    full = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg)) if v}
    # ample: 8 probes per pair2 always fits
    qa, va, ca, da, _ = congruent.find_congruent_quads_grid(
        *args, capacity=16384, cell_candidates=64,
        probe_budget=8 * len(pairs2))
    ample = {tuple(x) for x, v in zip(np.asarray(qa), np.asarray(va))
             if v}
    assert ample == full
    assert int(ca) == int(cg) and int(da) == int(dg)
    # tight: some non-empty cells dropped, every drop counted
    qt, vt, ct, dt, _ = congruent.find_congruent_quads_grid(
        *args, capacity=16384, cell_candidates=64, probe_budget=32)
    tight = {tuple(x) for x, v in zip(np.asarray(qt), np.asarray(vt))
             if v}
    assert tight <= full
    assert int(dt) > int(dg)
    assert len(tight) < len(full)       # budget 32 really bites here


def test_healpix_mode_grid_matches_dense(rng):
    """direction_bins="healpix" (the IndexedNormalHealSet analog) must
    keep the grid==dense parity contract — both paths apply the same
    rasterized pixel-membership mask."""
    pos = rng.uniform(-1, 1, size=(120, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 300)
    pairs2 = make_pairs(rng, pos, 300)
    for thr, cos_alpha in ((0.15, 0.25), (0.3, -0.4)):
        args = (jnp.asarray(pos),
                jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
                jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
                0.42, 0.58, thr, cos_alpha, 0.3)
        kw = dict(direction_bins="healpix", healpix_nside=4,
                  healpix_samples=32)
        qd, vd, cd = congruent.find_congruent_quads(
            *args, capacity=16384, **kw)
        qg, vg, cg, dropped, _ = congruent.find_congruent_quads_grid(
            *args, capacity=16384, cell_candidates=64, **kw)
        dense = {tuple(x) for x, v in zip(np.asarray(qd), np.asarray(vd))
                 if v}
        grid = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg))
                if v}
        assert int(dropped) == 0
        assert grid == dense, (len(grid), len(dense))
        assert len(dense) > 0     # the fixture must actually join


def test_healpix_mask_semantics(rng):
    """The healpix filter keeps exactly the candidates whose direction
    pixel lies on the rasterized alpha-circle — re-derived here with an
    independent membership check over the same pixelization."""
    from super4pcs_tpu.ops import healpix as hp

    pos = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 80)
    pairs2 = make_pairs(rng, pos, 80)
    thr, cos_alpha, nside, samples = 0.25, 0.3, 4, 48
    quads, valid, _ = congruent.find_congruent_quads(
        jnp.asarray(pos),
        jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
        jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
        0.5, 0.5, thr, cos_alpha, 0.3, capacity=8192,
        direction_bins="healpix", healpix_nside=nside,
        healpix_samples=samples)
    got = {tuple(q) for q, v in zip(np.asarray(quads), np.asarray(valid))
           if v}

    d1 = np.asarray(congruent.pair_directions(pos, np.asarray(pairs1)))
    d2 = np.asarray(congruent.pair_directions(pos, np.asarray(pairs2)))
    pix1 = np.asarray(hp.vec2pix_ring(nside, d1))
    circ = np.asarray(congruent.healpix_circle_pixels(
        d2, cos_alpha, nside, samples))
    expected = set()
    for k1, (a, b) in enumerate(np.asarray(pairs1)):
        e1 = pos[a] + 0.5 * (pos[b] - pos[a])
        for k2, (c, d) in enumerate(np.asarray(pairs2)):
            e2 = pos[c] + 0.5 * (pos[d] - pos[c])
            if (((e1 - e2) ** 2).sum() <= thr * thr
                    and pix1[k1] in circ[k2]):
                expected.add((a, b, c, d))
    assert got == expected


def test_grid_join_cell_overflow_counted(rng):
    """Saturating the per-cell cap must be visible in the dropped
    counter, never a silent miss."""
    # all invariant points collapse to one cell
    pos = np.zeros((64, 3), np.float32)
    pairs = np.stack([np.arange(32), np.arange(32) + 32], 1).astype(np.int32)
    q, v, c, dropped, _ = congruent.find_congruent_quads_grid(
        jnp.asarray(pos), jnp.asarray(pairs), jnp.ones(32, bool),
        jnp.asarray(pairs), jnp.ones(32, bool),
        0.5, 0.5, 0.1, 0.0, -1.0, capacity=4096, cell_candidates=4)
    assert int(dropped) > 0


def test_scale_band_gate_dense_and_grid(rng):
    """Similarity-mode scale-consistency gate (the reference MULTISCALE
    ratioDev, ref:match4pcsBase.cc:390-414, applied in the join): with
    scale_band on, exactly the candidates whose two implied scales agree
    within the band survive — and grid == dense under the gate."""
    pos = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    pairs1 = make_pairs(rng, pos, 200)
    pairs2 = make_pairs(rng, pos, 200)
    inv1, inv2 = 0.42, 0.58
    thr = 0.35
    seg_ratio, band = 1.3, 0.1    # base d1/d2 and the ratioDev width
    args = (jnp.asarray(pos),
            jnp.asarray(pairs1), jnp.ones(len(pairs1), bool),
            jnp.asarray(pairs2), jnp.ones(len(pairs2), bool),
            inv1, inv2, thr, 0.25, -1.0)

    q_off, v_off, _ = congruent.find_congruent_quads(*args, capacity=16384)
    q_on, v_on, _ = congruent.find_congruent_quads(
        *args, capacity=16384, seg_ratio=seg_ratio, scale_band=band)
    set_off = {tuple(x) for x, v in zip(np.asarray(q_off),
                                        np.asarray(v_off)) if v}
    set_on = {tuple(x) for x, v in zip(np.asarray(q_on),
                                       np.asarray(v_on)) if v}

    def ratio_ok(a, b, c, d):
        l1 = np.linalg.norm(pos[b] - pos[a])
        l2 = np.linalg.norm(pos[d] - pos[c])
        return abs(seg_ratio * l2 / max(l1, 1e-30) - 1.0) <= band

    expected = {q for q in set_off if ratio_ok(*q)}
    assert set_on == expected
    assert set_on < set_off        # the gate actually removed something

    qg, vg, _, dropped, _qs = congruent.find_congruent_quads_grid(
        *args, capacity=16384, cell_candidates=64,
        seg_ratio=seg_ratio, scale_band=band)
    grid = {tuple(x) for x, v in zip(np.asarray(qg), np.asarray(vg)) if v}
    assert int(dropped) == 0
    assert grid == set_on
