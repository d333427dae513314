"""Pallas rowcap-capture kernel parity (interpreter mode on CPU).

The kernel's contract vs the dense oracle (ops/pairs.extract_pairs
semantics restricted to the distance band): exact per-row hit COUNTS,
captured pairs a SUBSET of the oracle band set, and — with ample
per-segment quotas — exact SET equality. The capture rule is
segment-stratified (see kernels/rowcap_pallas.py docstring), so slot
ORDER is not compared.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from super4pcs_tpu.kernels import rowcap_pallas
from super4pcs_tpu.ops.pairs import PairFilterConfig, extract_pairs


def band_oracle(pos, b0, b1, eps):
    """All ordered (u, v), u != v, with ||q_u - q_v|| in the band."""
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    pd = np.linalg.norm(b0 - b1)
    lo, hi = max(pd - eps, 0.0), pd + eps
    m = (d >= lo) & (d <= hi)
    np.fill_diagonal(m, False)
    return {(u, v) for u, v in zip(*np.nonzero(m))}, m


@pytest.fixture
def cloud(rng):
    n = 700
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
    pos = (v * bump[:, None]).astype(np.float32)
    return pos - pos.mean(0)


def run_kernel(pos, base, eps, row_cap):
    """Run the kernel and re-pack its cols-only tables as (K1, 2)
    pairs for set comparison (slot s = (s // rc, cols[s]))."""
    rc_eff = rowcap_pallas.slots_for(len(pos), row_cap)
    outs = rowcap_pallas.extract_pairs_rowcap_pallas_both(
        jnp.asarray(pos), jnp.asarray(base), eps, rc_eff,
        interpret=True)
    packed = []
    for cols, valid, count, dropped in outs:
        u = np.arange(len(cols)) // rc_eff
        pairs = np.stack([u, np.asarray(cols)], axis=-1)
        packed.append((pairs, valid, count, dropped))
    return tuple(packed), rc_eff


def test_counts_and_subset(rng, cloud):
    base = cloud[rng.choice(len(cloud), 4, replace=False)]
    eps = 0.05
    (r1, r2), rc_eff = run_kernel(cloud, base, eps, 16)
    for (pairs, valid, count, dropped), (e0, e1) in zip(
            (r1, r2), ((0, 1), (2, 3))):
        oracle, m = band_oracle(cloud, base[e0], base[e1], eps)
        assert int(count) == len(oracle)            # exact pre-cap count
        got = {tuple(p) for p, v in zip(np.asarray(pairs),
                                        np.asarray(valid)) if v}
        assert got <= oracle                        # no false pairs
        assert len(got) + int(dropped) == len(oracle)
        # stratified capture with a tight cap still lands a healthy
        # fraction of the set (quota floor is 1 per 512-col segment)
        assert len(got) >= min(len(oracle), rc_eff * 0.2)


def test_exact_set_with_ample_quota(rng, cloud):
    """Quota >= the worst per-row per-segment occupancy => the capture
    is lossless and matches the oracle set exactly."""
    base = cloud[rng.choice(len(cloud), 4, replace=False)]
    eps = 0.08
    # worst-case per-row hits bounds per-segment occupancy
    oracle01, m01 = band_oracle(cloud, base[0], base[1], eps)
    oracle23, m23 = band_oracle(cloud, base[2], base[3], eps)
    worst = max(m01.sum(1).max(), m23.sum(1).max())
    (r1, r2), rc_eff = run_kernel(cloud, base, eps, int(worst) * 4)
    for (pairs, valid, count, dropped), oracle in zip(
            (r1, r2), (oracle01, oracle23)):
        got = {tuple(p) for p, v in zip(np.asarray(pairs),
                                        np.asarray(valid)) if v}
        assert got == oracle, (len(got), len(oracle))
        assert int(dropped) == 0


def test_matches_dense_extractor(rng, cloud):
    """Cross-check against the production dense extractor (the
    codebase's own oracle) on the same band config."""
    base = cloud[rng.choice(len(cloud), 4, replace=False)]
    zeros = np.zeros_like(cloud)
    negs = np.full_like(cloud, -1.0)
    eps = 0.06
    cfg = PairFilterConfig(use_distance_filter=True)
    (r1, _), rc_eff = run_kernel(cloud, base, eps, 64)
    pairs_d, valid_d, count_d, _ = extract_pairs(
        jnp.asarray(cloud), jnp.asarray(zeros), jnp.asarray(negs),
        jnp.asarray(base), jnp.asarray(zeros[:4]), jnp.asarray(negs[:4]),
        0, 1, eps, cfg, capacity=len(cloud) * 64)
    dense = {tuple(p) for p, v in zip(np.asarray(pairs_d),
                                      np.asarray(valid_d)) if v}
    pairs, valid, count, dropped = r1
    assert int(count) == int(count_d)
    got = {tuple(p) for p, v in zip(np.asarray(pairs),
                                    np.asarray(valid)) if v}
    assert got <= dense
    assert len(got) == len(dense) - int(dropped)


def test_fused_hash_matches_xla_formula(rng, cloud):
    """The kernel's per-slot join hash (r5 extension #1) must equal the
    XLA hash of the same slot's invariant point, and empty slots must
    carry the join sentinel."""
    from super4pcs_tpu.ops import congruent

    base = cloud[rng.choice(len(cloud), 4, replace=False)]
    eps, inv1, cell = 0.05, 0.37, 0.02
    rc_eff = rowcap_pallas.slots_for(len(cloud), 16)
    r1, r2, h1 = rowcap_pallas.extract_pairs_rowcap_pallas_both(
        jnp.asarray(cloud), jnp.asarray(base), eps, rc_eff,
        interpret=True, invariant1=jnp.float32(inv1), cell_size=cell)
    cols, valid, count, dropped = r1
    h1 = np.asarray(h1)
    valid = np.asarray(valid)
    rows = np.arange(len(h1)) // rc_eff
    e1 = np.asarray(congruent.invariant_points(
        jnp.asarray(cloud),
        jnp.stack([jnp.asarray(rows, jnp.int32), cols], axis=-1),
        jnp.float32(inv1)))
    cells = np.floor(e1 / cell).astype(np.int32)
    expect = np.asarray(congruent._cell_hash(cells))
    assert np.array_equal(h1[valid], expect[valid])
    assert np.all(h1[~valid] == 2147483647)
    # the second edge's result is unaffected by hash emission
    (p2_plain, v2_plain, *_), = (rowcap_pallas.
                                 extract_pairs_rowcap_pallas_both(
        jnp.asarray(cloud), jnp.asarray(base), eps, rc_eff,
        interpret=True)[1],)
    assert np.array_equal(np.asarray(r2[0]), np.asarray(p2_plain))


def _filter_parity(rng, cloud, cfg_kwargs, normal=None, rgb=None,
                   base_norm=None, base_rgb=None):
    """Kernel capture (ample quota) vs the dense ops/pairs oracle with
    the same filter config: exact per-row counts + exact set equality."""
    n = len(cloud)
    base_ids = rng.choice(n, 4, replace=False)
    base = cloud[base_ids]
    eps = 0.05
    zeros = np.zeros_like(cloud)
    negs = np.full_like(cloud, -1.0)
    normal = zeros if normal is None else normal
    rgb = negs if rgb is None else rgb
    base_norm = normal[base_ids] if base_norm is None else base_norm
    base_rgb = rgb[base_ids] if base_rgb is None else base_rgb

    cfg = PairFilterConfig(use_distance_filter=True, **cfg_kwargs)
    oracle = {}
    worst_row = 8
    for e, (e0, e1) in enumerate(((0, 1), (2, 3))):
        pairs_d, valid_d, count_d, _ = extract_pairs(
            jnp.asarray(cloud), jnp.asarray(normal), jnp.asarray(rgb),
            jnp.asarray(base), jnp.asarray(base_norm),
            jnp.asarray(base_rgb), e0, e1, eps, cfg,
            capacity=n * 256)   # ample: never truncates the oracle
        oset = {tuple(p) for p, v in zip(np.asarray(pairs_d),
                                         np.asarray(valid_d)) if v}
        oracle[e] = (oset, int(count_d))
        if oset:
            rows, counts = np.unique([p[0] for p in oset],
                                     return_counts=True)
            worst_row = max(worst_row, int(counts.max()))

    # ample per-segment quota: the per-row worst bounds any segment's
    rc_eff = rowcap_pallas.slots_for(n, worst_row * 4)
    outs = rowcap_pallas.extract_pairs_rowcap_pallas_both(
        jnp.asarray(cloud), jnp.asarray(base), eps, rc_eff,
        interpret=True,
        normal=jnp.asarray(normal), rgb=jnp.asarray(rgb),
        base_norm=jnp.asarray(base_norm), base_rgb=jnp.asarray(base_rgb),
        max_normal_difference=cfg_kwargs.get("max_normal_difference",
                                             -1.0),
        max_color_distance=cfg_kwargs.get("max_color_distance", -1.0),
        max_translation_distance=cfg_kwargs.get(
            "max_translation_distance", -1.0),
        max_angle=cfg_kwargs.get("max_angle", -1.0))
    for e, (pairs, valid, count, dropped) in enumerate(outs):
        oset, ocount = oracle[e]
        assert int(count) == ocount, (e, int(count), ocount)
        u = np.arange(len(pairs)) // rc_eff
        got = {(int(a), int(b)) for a, b, v in zip(
            u, np.asarray(pairs), np.asarray(valid)) if v}
        assert got <= oset
        assert len(got) + int(dropped) == ocount


def test_filtered_capture_normals(rng, cloud):
    nrm = rng.normal(size=cloud.shape).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm[::7] = 0.0    # invalid normals take the escape path
    _filter_parity(rng, cloud, dict(max_normal_difference=25.0),
                   normal=nrm)


def test_filtered_capture_color_translation(rng, cloud):
    rgb = rng.uniform(0, 255, size=cloud.shape).astype(np.float32)
    rgb[::5] = -1.0   # colorless points take the escape path
    _filter_parity(rng, cloud,
                   dict(max_color_distance=120.0,
                        max_translation_distance=1.1), rgb=rgb)


def test_filtered_capture_angle(rng, cloud):
    _filter_parity(rng, cloud, dict(max_angle=70.0))


def test_filtered_capture_all(rng, cloud):
    nrm = rng.normal(size=cloud.shape).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = rng.uniform(0, 255, size=cloud.shape).astype(np.float32)
    _filter_parity(rng, cloud,
                   dict(max_normal_difference=40.0,
                        max_color_distance=150.0,
                        max_translation_distance=1.3,
                        max_angle=80.0),
                   normal=nrm, rgb=rgb)


def test_slots_rounding():
    # segments x per-segment quota
    assert rowcap_pallas.slots_for(8192, 160) == 160     # 16 segs x 10
    assert rowcap_pallas.slots_for(32768, 160) == 192    # 64 segs x 3
    assert rowcap_pallas.slots_for(65536, 160) == 256    # 128 segs x 2
    assert rowcap_pallas.slots_for(700, 16) == 16        # 4 segs x 4


def test_tile_reject_output_identical(rng, cloud):
    """Tile rejection (r5) must be output-IDENTICAL to the unrejected
    kernel: it may only skip tile pairs whose bounding spheres cannot
    meet the band, so per-segment hit sets — and therefore the
    stratified capture, counts, and fused hashes — are unchanged."""
    # Morton order makes tiles spatially compact => rejection fires
    from super4pcs_tpu.ops.sampling import morton_argsort
    pos = cloud[morton_argsort(cloud)]
    base = pos[rng.choice(len(pos), 4, replace=False)]
    eps = 0.05
    rc_eff = rowcap_pallas.slots_for(len(pos), 16)
    outs = {}
    for flag in (True, False):
        outs[flag] = rowcap_pallas.extract_pairs_rowcap_pallas_both(
            jnp.asarray(pos), jnp.asarray(base), eps, rc_eff,
            interpret=True, invariant1=jnp.float32(0.4),
            cell_size=0.02, tile_reject=flag)
    for a, b in zip(outs[True][:2], outs[False][:2]):
        for xa, xb in zip(a, b):
            assert np.array_equal(np.asarray(xa), np.asarray(xb))
    assert np.array_equal(np.asarray(outs[True][2]),
                          np.asarray(outs[False][2]))   # fused hashes


def test_tile_reject_counts_exact_vs_oracle(rng):
    """Rejection armed on a Morton-ordered cloud large enough that many
    tile pairs actually reject: outputs must be bit-identical to the
    unrejected kernel (the conservative-bound invariant), and the
    capture must agree with the brute-force oracle up to band-EDGE
    rounding only (the kernel's |u|^2+|v|^2-2u.v expansion rounds
    differently from the oracle's direct difference — a pre-existing
    ~1e-7-relative edge effect unrelated to rejection)."""
    from super4pcs_tpu.ops.sampling import morton_argsort
    n = 2500
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = 1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
    pos = (v * bump[:, None]).astype(np.float32)
    pos -= pos.mean(0)
    pos = pos[morton_argsort(pos)]
    base = pos[rng.choice(n, 4, replace=False)]
    eps = 0.03
    rc_eff = rowcap_pallas.slots_for(n, 8)
    on = rowcap_pallas.extract_pairs_rowcap_pallas_both(
        jnp.asarray(pos), jnp.asarray(base), eps, rc_eff,
        interpret=True, tile_reject=True)
    off = rowcap_pallas.extract_pairs_rowcap_pallas_both(
        jnp.asarray(pos), jnp.asarray(base), eps, rc_eff,
        interpret=True, tile_reject=False)
    for a, b in zip(on, off):
        for xa, xb in zip(a, b):
            assert np.array_equal(np.asarray(xa), np.asarray(xb))
    for (cols, valid, count, dropped), (e0, e1) in zip(
            on, ((0, 1), (2, 3))):
        oracle, _ = band_oracle(pos, base[e0], base[e1], eps)
        # exact up to band-edge rounding: a handful of pairs within f32
        # noise of the band boundary may classify differently
        assert abs(int(count) - len(oracle)) <= 8, (
            int(count), len(oracle))
        vmask = np.asarray(valid)
        u = (np.arange(len(cols)) // rc_eff)[vmask]
        c = np.asarray(cols)[vmask]
        pd = float(np.linalg.norm(base[e0] - base[e1]))
        d = np.linalg.norm(pos[u] - pos[c], axis=-1)
        ok = ((d >= max(pd - eps, 0.0) * (1 - 1e-5) - 1e-6)
              & (d <= (pd + eps) * (1 + 1e-5) + 1e-6))
        assert np.all(ok)
        assert int(vmask.sum()) + int(dropped) == int(count)
