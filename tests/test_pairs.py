"""Pair extraction vs a literal brute-force oracle — the rebuild analog
of the reference's pair_extraction test (exact set equality against
brute force, ref:tests/pair_extraction.cc:207-208)."""

import math

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops.pairs import PairFilterConfig, extract_pairs


def oracle_pairs(pos, normal, rgb, base_pos, base_norm, base_rgb,
                 e0, e1, cfg):
    """Brute-force transcription of the pair filter in *ordered* form:
    every filter evaluated per emitted (first, second) orientation. The
    reference checks color/translation once per unordered pair and
    emits both orders (ref:pairCreationFunctor.h:151-218) — that quirk
    is deliberately not reproduced (see ops/pairs.py docstring)."""
    out = []
    n = len(pos)
    pair_distance = np.linalg.norm(base_pos[e0] - base_pos[e1])
    pna = np.linalg.norm(base_norm[e0] - base_norm[e1])
    eps = cfg["pair_distance_epsilon"]
    seg1 = base_pos[e1] - base_pos[e0]
    seg1 = seg1 / np.linalg.norm(seg1)
    for u in range(n):
        for v in range(n):
            if u == v:
                continue
            first, second = pos[u], pos[v]
            distance = np.linalg.norm(second - first)
            if abs(distance - pair_distance) > eps:
                continue
            mnd = cfg["max_normal_difference"]
            if (mnd > 0 and np.dot(normal[u], normal[u]) > 0
                    and np.dot(normal[v], normal[v]) > 0):
                thr = 0.5 * mnd * math.pi / 180.0
                fa = np.linalg.norm(normal[u] - normal[v])
                sa = np.linalg.norm(normal[u] + normal[v])
                if min(abs(fa - pna), abs(sa - pna)) > thr:
                    continue
            mcd = cfg["max_color_distance"]
            if mcd > 0:
                use_rgb = (rgb[u][0] >= 0 and rgb[v][0] >= 0
                           and base_rgb[e0][0] >= 0 and base_rgb[e1][0] >= 0)
                good = (np.linalg.norm(rgb[u] - base_rgb[e0]) < mcd
                        and np.linalg.norm(rgb[v] - base_rgb[e1]) < mcd)
                if use_rgb and not good:
                    continue
            mtd = cfg["max_translation_distance"]
            if mtd > 0:
                if not (np.linalg.norm(first - base_pos[e0]) < mtd
                        and np.linalg.norm(second - base_pos[e1]) < mtd):
                    continue
            ma = cfg["max_angle"]
            if ma > 0:
                seg2 = (second - first) / np.linalg.norm(second - first)
                mar = ma * math.pi / 180.0
                if math.acos(np.clip(np.dot(seg1, seg2), -1, 1)) > mar:
                    continue
            out.append((u, v))
    return set(out)


def run_case(rng, n=60, **filters):
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    # some points without color (sentinel -1, ref:shared4pcs.h:110)
    rgb[rng.uniform(size=n) < 0.3] = -1.0

    base_idx = rng.choice(n, size=4, replace=False)
    base_pos, base_norm, base_rgb = (pos[base_idx], normal[base_idx],
                                     rgb[base_idx])

    cfg_d = dict(max_normal_difference=-1.0, max_color_distance=-1.0,
                 max_translation_distance=-1.0, max_angle=-1.0,
                 pair_distance_epsilon=0.3)
    cfg_d.update(filters)
    cfg = PairFilterConfig(
        max_normal_difference=cfg_d["max_normal_difference"],
        max_color_distance=cfg_d["max_color_distance"],
        max_translation_distance=cfg_d["max_translation_distance"],
        max_angle=cfg_d["max_angle"])

    pairs, valid, count, dropped = extract_pairs(
        jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(rgb),
        jnp.asarray(base_pos), jnp.asarray(base_norm), jnp.asarray(base_rgb),
        0, 1, cfg_d["pair_distance_epsilon"], cfg, capacity=4096)
    got = {tuple(p) for p, v in zip(np.asarray(pairs), np.asarray(valid))
           if v}
    expected = oracle_pairs(pos, normal, rgb, base_pos, base_norm, base_rgb,
                            0, 1, cfg_d)
    assert int(count) == len(expected)
    assert got == expected, (
        f"missing={expected - got} extra={got - expected}")


def test_distance_only(rng):
    run_case(rng)


def test_normal_filter(rng):
    run_case(rng, max_normal_difference=30.0)


def test_color_filter(rng):
    run_case(rng, max_color_distance=0.4)


def test_translation_filter(rng):
    run_case(rng, max_translation_distance=1.0)


def test_angle_filter(rng):
    run_case(rng, max_angle=60.0)


def test_all_filters(rng):
    run_case(rng, max_normal_difference=45.0, max_color_distance=0.6,
             max_translation_distance=1.5, max_angle=90.0)


def test_capacity_overflow_reports_true_count(rng):
    pos = rng.uniform(-0.1, 0.1, size=(40, 3)).astype(np.float32)
    zero = np.zeros_like(pos)
    rgb = np.full_like(pos, -1.0)
    base_pos = pos[:4]
    cfg = PairFilterConfig()
    pairs, valid, count, dropped = extract_pairs(
        jnp.asarray(pos), jnp.asarray(zero), jnp.asarray(rgb),
        jnp.asarray(base_pos), jnp.asarray(zero[:4]), jnp.asarray(rgb[:4]),
        0, 1, 10.0, cfg, capacity=8)   # eps huge: all pairs pass
    assert int(valid.sum()) == 8
    assert int(count) == 40 * 39  # both orders of every unordered pair
    assert int(dropped) == 40 * 39 - 8


def test_blocked_matches_dense(rng):
    """extract_pairs_blocked must produce the same pair set as the dense
    form, for every filter combination."""
    from super4pcs_tpu.ops.pairs import extract_pairs_blocked
    n = 150
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.float32)
    base = pos[:4]
    base_n = nrm[:4]
    base_c = rgb[:4]
    cfgs = [
        PairFilterConfig(),
        PairFilterConfig(max_normal_difference=25.0),
        PairFilterConfig(max_color_distance=120.0),
        PairFilterConfig(max_angle=120.0),
        PairFilterConfig(max_normal_difference=30.0,
                         max_color_distance=150.0,
                         max_translation_distance=1.5, max_angle=150.0),
        PairFilterConfig(use_distance_filter=False),
    ]
    for cfg in cfgs:
        args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(rgb),
                jnp.asarray(base), jnp.asarray(base_n), jnp.asarray(base_c),
                0, 1, 0.08, cfg)
        pd, vd, cd, dd = extract_pairs(*args, capacity=16384)
        pb, vb, cb, db = extract_pairs_blocked(*args, capacity=16384, block=64)
        dense = {tuple(x) for x, v in zip(np.asarray(pd), np.asarray(vd))
                 if v}
        blocked = {tuple(x) for x, v in zip(np.asarray(pb), np.asarray(vb))
                   if v}
        assert blocked == dense, (cfg, len(blocked), len(dense))
        assert int(cb) == int(cd)


def test_blocked_capacity_overflow(rng):
    from super4pcs_tpu.ops.pairs import extract_pairs_blocked
    pos = rng.uniform(-0.01, 0.01, (64, 3)).astype(np.float32)  # all close
    z = jnp.zeros_like(jnp.asarray(pos))
    pairs, valid, count, dropped = extract_pairs_blocked(
        jnp.asarray(pos), z, jnp.full_like(z, -1.0),
        jnp.asarray(pos[:4]), z[:4], jnp.full_like(z[:4], -1.0),
        0, 1, 10.0, PairFilterConfig(), capacity=128, block=32)
    assert int(count) > 128          # true count reported
    assert int(valid.sum()) == 128   # buffer full, no corruption
    assert int(count) == int(valid.sum()) + int(dropped)


def test_blocked_per_block_drop_counted(rng):
    """Hits concentrated in one row block must be counted as dropped
    even when the global total stays under capacity (the silent-drop
    class: per-block local_cap clips before the global merge ever
    fills).

    Geometry: a 32-point cluster at the origin (row block 0) paired
    against 80 targets on a +x spherical cap at distance 1. The
    max_angle filter kills the reversed orientation, so nearly every
    hit lands in block 0: ~2560 hits > local_cap while the global
    total stays under capacity=4096."""
    from super4pcs_tpu.ops.pairs import extract_pairs_blocked
    n = 256
    pos = np.zeros((n, 3), np.float32)
    pos[:32] = rng.normal(scale=0.003, size=(32, 3))      # cluster, block 0
    d = rng.normal(size=(80, 3))
    d[:, 0] = np.abs(d[:, 0]) + 1.5                        # +x cap
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos[32:112] = d                                        # targets at r=1
    pos[112:] = np.stack([1000.0 + 10.0 * np.arange(n - 112),
                          np.zeros(n - 112), np.zeros(n - 112)],
                         axis=1)                           # inert far points
    base_pos = np.array([[0, 0, 0], [1, 0, 0],
                         [0, 0.5, 0], [0.5, 0.5, 0]], np.float32)
    z = jnp.zeros((n, 3), jnp.float32)
    neg = jnp.full((n, 3), -1.0, jnp.float32)
    cfg = PairFilterConfig(max_angle=90.0)
    pairs, valid, count, dropped = extract_pairs_blocked(
        jnp.asarray(pos), z, neg,
        jnp.asarray(base_pos), jnp.zeros((4, 3)), jnp.full((4, 3), -1.0),
        0, 1, 0.1, cfg, capacity=4096, block=32)
    count, dropped, captured = int(count), int(dropped), int(valid.sum())
    assert count < 4096              # global capacity NOT exceeded
    assert dropped > 0               # ...but a block clipped locally
    assert captured == count - dropped
    # and the dense form on the same inputs confirms the true count
    _, vd, cd, _ = extract_pairs(
        jnp.asarray(pos), z, neg,
        jnp.asarray(base_pos), jnp.zeros((4, 3)), jnp.full((4, 3), -1.0),
        0, 1, 0.1, cfg, capacity=8192)
    assert int(cd) == count


def test_rowcap_matches_dense(rng):
    """extract_pairs_rowcap (the nq>2048 production path) must produce
    the same pair set as the dense oracle when no row overflows its cap
    (on CPU approx_max_k lowers to exact top_k, so parity is exact)."""
    from super4pcs_tpu.ops.pairs import extract_pairs_rowcap
    n = 150
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.float32)
    base = pos[:4]
    base_n = nrm[:4]
    base_c = rgb[:4]
    cfgs = [
        PairFilterConfig(),
        PairFilterConfig(max_normal_difference=25.0),
        PairFilterConfig(max_color_distance=120.0),
        PairFilterConfig(max_angle=120.0),
        PairFilterConfig(max_normal_difference=30.0,
                         max_color_distance=150.0,
                         max_translation_distance=1.5, max_angle=150.0),
        PairFilterConfig(use_distance_filter=False),
    ]
    for cfg in cfgs:
        args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(rgb),
                jnp.asarray(base), jnp.asarray(base_n), jnp.asarray(base_c),
                0, 1, 0.08, cfg)
        pd, vd, cd, dd = extract_pairs(*args, capacity=16384)
        pr, vr, cr, dr = extract_pairs_rowcap(
            *args, capacity=16384, row_cap=n, row_block=64)
        dense = {tuple(x) for x, v in zip(np.asarray(pd), np.asarray(vd))
                 if v}
        rowcap = {tuple(x) for x, v in zip(np.asarray(pr), np.asarray(vr))
                  if v}
        assert rowcap == dense, (cfg, len(rowcap), len(dense))
        assert int(cr) == int(cd)
        # drops only at the shared global capacity (none per-row here)
        assert int(dr) == int(dd)


def test_rowcap_row_overflow_counted(rng):
    """A row with more hits than row_cap drops its tail; the drop must
    be counted exactly (count == captured + dropped), never silent."""
    from super4pcs_tpu.ops.pairs import extract_pairs_rowcap
    # point 0 at the origin; 100 points on the unit sphere around it ->
    # row 0 alone has ~100 hits at pair distance 1
    n = 128
    pos = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos[1:101] = d
    pos[101:] = 500.0 + 10.0 * rng.uniform(size=(27, 3)).astype(np.float32)
    base_pos = np.array([[0, 0, 0], [1, 0, 0],
                         [0, 0.5, 0], [0.5, 0.5, 0]], np.float32)
    z = jnp.zeros((n, 3), jnp.float32)
    neg = jnp.full((n, 3), -1.0, jnp.float32)
    pairs, valid, count, dropped = extract_pairs_rowcap(
        jnp.asarray(pos), z, neg,
        jnp.asarray(base_pos), jnp.zeros((4, 3)), jnp.full((4, 3), -1.0),
        0, 1, 0.05, PairFilterConfig(), capacity=4096,
        row_cap=32, row_block=32)
    count, dropped, captured = int(count), int(dropped), int(valid.sum())
    assert count < 4096                    # global capacity not exceeded
    assert dropped > 0                     # ...but row 0 clipped
    assert captured == count - dropped
    # the captured subset is itself correct (every pair is a true hit)
    got = np.asarray(pairs)[np.asarray(valid)]
    dd = np.linalg.norm(pos[got[:, 0]] - pos[got[:, 1]], axis=1)
    assert (np.abs(dd - 1.0) <= 0.05).all()


def test_rowcap_layout_matches_compacted(rng):
    """extract_pairs_rowcap_layout must produce the same pair set and
    the same count/dropped accounting as the compacted form when the
    compacted capacity is ample (the layout form has no capacity)."""
    from super4pcs_tpu.ops.pairs import (extract_pairs_rowcap,
                                         extract_pairs_rowcap_layout)
    n = 200
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    z = jnp.zeros((n, 3), jnp.float32)
    neg = jnp.full((n, 3), -1.0, jnp.float32)
    base = (jnp.asarray(pos[:4]), jnp.zeros((4, 3)),
            jnp.full((4, 3), -1.0))
    for row_cap, off in ((n, None), (8, jnp.int32(37))):
        args = (jnp.asarray(pos), z, neg, *base, 0, 1, 0.15,
                PairFilterConfig())
        pc, vc, cc, dc = extract_pairs_rowcap(
            *args, capacity=65536, row_cap=row_cap, row_block=64,
            col_offset=off)
        pl, vl, cl, dl = extract_pairs_rowcap_layout(
            *args, row_cap=row_cap, row_block=64, col_offset=off)
        setc = {tuple(x) for x, ok in zip(np.asarray(pc), np.asarray(vc))
                if ok}
        setl = {tuple(x) for x, ok in zip(np.asarray(pl), np.asarray(vl))
                if ok}
        assert setl == setc
        assert int(cl) == int(cc) and int(dl) == int(dc)
        # slot s holds row s // row_cap
        got = np.asarray(pl)[np.asarray(vl)]
        slots = np.where(np.asarray(vl))[0]
        assert (got[:, 0] == slots // row_cap).all()


def test_rowcap_layout_both_matches_separate(rng):
    """The fused two-edge scan (shared block geometry, one approx_max_k
    call — the production extraction of the large-nq step) must emit
    exactly what two separate per-edge layout calls emit, including the
    count/dropped accounting, for every filter configuration."""
    from super4pcs_tpu.ops.pairs import (extract_pairs_rowcap_layout,
                                         extract_pairs_rowcap_layout_both)
    n = 160
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    base = (jnp.asarray(pos[:4]), jnp.asarray(nrm[:4]),
            jnp.asarray(rgb[:4]))
    cfgs = [PairFilterConfig(),
            PairFilterConfig(max_normal_difference=40.0,
                             max_color_distance=200.0,
                             max_translation_distance=2.5),
            PairFilterConfig(max_angle=120.0)]
    for cfg in cfgs:
        for row_cap, off in ((32, None), (8, jnp.int32(53))):
            args = (jnp.asarray(pos), jnp.asarray(nrm),
                    jnp.asarray(rgb), *base)
            fused = extract_pairs_rowcap_layout_both(
                *args, 0.2, cfg, row_cap=row_cap, row_block=64,
                col_offset=off)
            for edge, (pf, vf, cf, df) in zip(((0, 1), (2, 3)), fused):
                ps, vs, cs, ds = extract_pairs_rowcap_layout(
                    *args, *edge, 0.2, cfg, row_cap=row_cap,
                    row_block=64, col_offset=off)
                assert int(cf) == int(cs) and int(df) == int(ds)
                np.testing.assert_array_equal(np.asarray(vf),
                                              np.asarray(vs))
                got_f = np.asarray(pf)[np.asarray(vf)]
                got_s = np.asarray(ps)[np.asarray(vs)]
                np.testing.assert_array_equal(got_f, got_s)


def test_rowcap_col_offset(rng):
    """col_offset rotates the per-row keep preference: with ample cap
    the pair *set* is unchanged for any offset; under cap pressure
    different offsets capture different (all-true) subsets, which is the
    decorrelation the matcher relies on across RANSAC trials."""
    from super4pcs_tpu.ops.pairs import extract_pairs_rowcap
    n = 128
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    z = jnp.zeros((n, 3), jnp.float32)
    neg = jnp.full((n, 3), -1.0, jnp.float32)
    base = (jnp.asarray(pos[:4]), jnp.zeros((4, 3)),
            jnp.full((4, 3), -1.0))
    args = (jnp.asarray(pos), z, neg, *base, 0, 1, 0.3,
            PairFilterConfig())

    def pairset(**kw):
        p, v, c, d = extract_pairs_rowcap(*args, capacity=16384,
                                          row_block=64, **kw)
        return ({tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
                 if ok}, int(c), int(d))

    # ample row_cap: any rotation keeps the identical set, zero drops
    s0, c0, d0 = pairset(row_cap=n)
    for off in (0, 1, 37, n - 1):
        s, c, d = pairset(row_cap=n, col_offset=jnp.int32(off))
        assert s == s0 and c == c0 and d == d0 == 0

    # tight row_cap: rotations capture *different* true subsets
    subsets = [pairset(row_cap=4, col_offset=jnp.int32(off))[0]
               for off in (0, 31, 67, 101)]
    assert any(a != b for a in subsets for b in subsets if a is not b)
    pd = np.linalg.norm(pos[1] - pos[0])  # base segment 0-1 length
    for s in subsets:
        got = np.array(sorted(s))
        dd = np.linalg.norm(pos[got[:, 0]] - pos[got[:, 1]], axis=1)
        assert (np.abs(dd - pd) <= 0.3).all()  # |d - pair_dist| <= eps


def test_dense_row_offset_rotation(rng):
    """extract_pairs(row_offset=...): with ample capacity any rotation
    returns the identical pair set; under overflow different offsets
    capture different (still-correct) subsets — the dense-path capture
    decorrelation estimate_scale mode relies on (see ops/pairs.py)."""
    n = 48
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    zeros = np.zeros((n, 3), np.float32)
    rgbs = np.full((n, 3), -1.0, np.float32)
    base_idx = rng.choice(n, size=4, replace=False)
    cfg = PairFilterConfig(use_distance_filter=False)  # every (u, v) hits

    def run(capacity, off):
        p, v, c, d = extract_pairs(
            jnp.asarray(pos), jnp.asarray(zeros), jnp.asarray(rgbs),
            jnp.asarray(pos[base_idx]), jnp.asarray(zeros[base_idx]),
            jnp.asarray(rgbs[base_idx]), 0, 1, 0.3, cfg,
            capacity=capacity,
            row_offset=None if off is None else jnp.int32(off))
        s = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
             if ok}
        return s, int(c), int(d)

    full = n * (n - 1)
    s_none, c0, d0 = run(full, None)
    assert c0 == full and d0 == 0
    for off in (0, 7, n - 1, n + 3):    # offsets wrap mod n
        s, c, d = run(full, off)
        assert s == s_none and d == 0

    # overflow: sets differ by offset, every captured pair is genuine
    subsets = [run(full // 3, off)[0] for off in (0, 11, 29)]
    assert any(a != b for a in subsets for b in subsets if a is not b)
    for s in subsets:
        assert len(s) == full // 3
        assert s <= s_none


def test_dense_rowcap_matches_extract_pairs(rng):
    """extract_pairs_dense_rowcap (the gather-free per-row capture the
    toy-scale dense path uses, r5) against extract_pairs: identical
    pre-cap counts and exact set equality at ample capacity; under
    per-row pressure every captured pair is genuine, row-fair, and
    drops stay item-exact."""
    from super4pcs_tpu.ops.pairs import extract_pairs_dense_rowcap

    n = 120
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    base = rng.choice(n, 4, replace=False)
    cfg = PairFilterConfig(max_normal_difference=40.0,
                           max_color_distance=160.0)

    def run(fn, capacity):
        p, v, c, d = fn(
            jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(rgb),
            jnp.asarray(pos[base]), jnp.asarray(nrm[base]),
            jnp.asarray(rgb[base]), 0, 1, 0.4, cfg, capacity=capacity)
        s = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
             if ok}
        return s, int(c), int(d)

    s_ref, c_ref, _ = run(extract_pairs, n * n)
    s_new, c_new, d_new = run(extract_pairs_dense_rowcap, n * n)
    assert c_new == c_ref
    assert s_new == s_ref
    assert d_new == 0

    # per-row pressure: row_cap = 4; each row keeps its first 4 hits
    s_cap, c_cap, d_cap = run(extract_pairs_dense_rowcap, 4 * n)
    assert c_cap == c_ref
    assert s_cap <= s_ref
    assert len(s_cap) + d_cap == c_ref
    rows = {}
    for (u, v) in s_cap:
        rows.setdefault(u, []).append(v)
    per_row_ref = {}
    for (u, v) in s_ref:
        per_row_ref.setdefault(u, []).append(v)
    for u, vs in rows.items():
        assert len(vs) <= 4
        # first-in-column-order capture per row
        assert sorted(vs) == sorted(per_row_ref[u])[:len(vs)]


def test_masked_indices_2d_matches_flat(rng):
    """masked_indices_2d must be bit-identical to the flat form on the
    row-major flattening, including overflow and empty masks."""
    from super4pcs_tpu.ops.masking import masked_indices, masked_indices_2d

    for shape, cap in (((7, 13), 40), ((16, 128), 100), ((16, 128), 3000),
                       ((5, 8), 8)):
        m = rng.random(shape) < 0.3
        mj = jnp.asarray(m)
        i1, v1, c1 = masked_indices(mj.reshape(-1), cap)
        i2, v2, c2 = masked_indices_2d(mj, cap)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        assert int(c1) == int(c2)
    # empty mask
    z = jnp.zeros((4, 16), bool)
    i2, v2, c2 = masked_indices_2d(z, 8)
    assert int(c2) == 0 and not np.asarray(v2).any()
