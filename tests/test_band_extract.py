"""Banded (sorted cell-pair table) pair engine vs the dense oracle.

The reference's own testing pattern for its pair-extraction engines:
exact set equality against brute force (ref:tests/pair_extraction.cc:
207-208). The banded engine's conservative cell band guarantees every
true pair's cell pair is examined, so with ample caps the validated
output must EQUAL the dense engine's."""

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops.band_extract import (
    BandIndex, build_band_index, extract_pairs_banded)
from super4pcs_tpu.ops.pairs import PairFilterConfig, extract_pairs


def _cloud(rng, n):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1]))
    return (v * bump[:, None]).astype(np.float32)


def _dense_set(pos, normal, rgb, base, bn, brgb, e0, e1, eps, cfg):
    p, v, c, d = extract_pairs(
        jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(rgb),
        jnp.asarray(base), jnp.asarray(bn), jnp.asarray(brgb),
        e0, e1, eps, cfg, capacity=pos.shape[0] * pos.shape[0])
    assert int(d) == 0
    return ({tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
             if ok}, int(c))


def _banded_set(idx, pos, normal, rgb, base, bn, brgb, e0, e1, eps, cfg,
                cap=65536, rot=None):
    p, v, c, d = extract_pairs_banded(
        idx, jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(rgb),
        jnp.asarray(base), jnp.asarray(bn), jnp.asarray(brgb),
        e0, e1, eps, cfg, cell_pair_cap=cap, rot_offset=rot)
    return ({tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
             if ok}, int(c), int(d))


def test_banded_matches_dense_distance_only(rng):
    pos = _cloud(rng, 400)
    zeros = np.zeros_like(pos)
    rgbs = np.full_like(pos, -1.0)
    base = pos[rng.choice(400, 4, replace=False)]
    cfg = PairFilterConfig()
    idx = build_band_index(pos, delta=0.05)
    assert idx.member_dropped == 0

    for (e0, e1) in ((0, 1), (2, 3)):
        dense, dc = _dense_set(pos, zeros, rgbs, base, zeros[:4],
                               rgbs[:4], e0, e1, 0.1, cfg)
        band, bc, bd = _banded_set(idx, pos, zeros, rgbs, base,
                                   zeros[:4], rgbs[:4], e0, e1, 0.1, cfg)
        assert bd == 0
        assert band == dense and bc == dc, (len(band), len(dense))


def test_banded_matches_dense_all_filters(rng):
    n = 300
    pos = _cloud(rng, n)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    rgb[rng.uniform(size=n) < 0.3] = -1.0
    bi = rng.choice(n, 4, replace=False)
    cfg = PairFilterConfig(max_normal_difference=25.0,
                           max_color_distance=0.5,
                           max_translation_distance=1.6,
                           max_angle=80.0)
    idx = build_band_index(pos, delta=0.05)
    dense, dc = _dense_set(pos, normal, rgb, pos[bi], normal[bi],
                           rgb[bi], 0, 1, 0.12, cfg)
    band, bc, bd = _banded_set(idx, pos, normal, rgb, pos[bi],
                               normal[bi], rgb[bi], 0, 1, 0.12, cfg)
    assert bd == 0
    assert band == dense and bc == dc


def test_banded_cap_overflow_counted_and_rotates(rng):
    """Band entries beyond cell_pair_cap are dropped WITH counting, and
    the rotation offset changes which subset survives (the capture-
    lottery decorrelation across trials)."""
    pos = _cloud(rng, 500)
    zeros = np.zeros_like(pos)
    rgbs = np.full_like(pos, -1.0)
    base = pos[rng.choice(500, 4, replace=False)]
    cfg = PairFilterConfig()
    idx = build_band_index(pos, delta=0.05)

    full, _, d0 = _banded_set(idx, pos, zeros, rgbs, base, zeros[:4],
                              rgbs[:4], 0, 1, 0.1, cfg,
                              cap=idx.m * idx.m)
    assert d0 == 0
    subsets = []
    for rot in (0, 977, 31415):
        s, c, d = _banded_set(idx, pos, zeros, rgbs, base, zeros[:4],
                              rgbs[:4], 0, 1, 0.1, cfg, cap=64,
                              rot=jnp.int32(rot))
        assert d > 0
        assert s <= full
        subsets.append(s)
    assert any(a != b for a in subsets for b in subsets if a is not b)


def test_band_index_member_cap_counted(rng):
    """Points beyond the per-cell member cap are counted at build."""
    pos = np.zeros((50, 3), np.float32)      # all in one cell
    idx = build_band_index(pos, delta=0.05, pc=8)
    assert idx.member_dropped == 42
    assert int(np.asarray(idx.occ)[0]) == 50


def test_banded_engine_end_to_end(rng):
    """Full registration with pair_engine='banded' recovers the pose
    within the reference thresholds — same contract as the dense-engine
    tests (rot <= 0.2, tr <= 0.1, ref:tests/matching.cc:333-335)."""
    from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud

    pos = _cloud(rng, 300)
    a = rng.normal(size=(3, 3))
    qm, r = np.linalg.qr(a)
    qm = qm * np.sign(np.diag(r))
    if np.linalg.det(qm) < 0:
        qm[:, 0] = -qm[:, 0]
    mat = np.eye(4, dtype=np.float32)
    mat[:3, :3] = qm
    mat[:3, 3] = rng.uniform(-0.4, 0.4, 3)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    opts = Options(delta=0.05, sample_size=300, max_time_seconds=30,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   pair_engine="banded",
                   random_seed=7).configure_overlap(0.9)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    assert m._band_index is not None
    assert "band_cells" in res.stats
    assert res.score > 0.8, res.score
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    d2 = ((moved[:, None, :] - pos[None, :, :]) ** 2).sum(-1).min(1)
    assert (np.sqrt(d2) < 0.05).mean() > 0.8


def test_banded_capacity_compaction(rng):
    """capacity= compacts the validated hits to an extract_pairs-style
    buffer: same pair SET as the raw slot layout when it fits, and
    exact cap accounting when it does not."""
    pos = _cloud(rng, 300)
    zeros = np.zeros_like(pos)
    rgbs = np.full_like(pos, -1.0)
    base = pos[rng.choice(300, 4, replace=False)]
    cfg = PairFilterConfig()
    idx = build_band_index(pos, delta=0.05)

    raw, rc, rd = _banded_set(idx, pos, zeros, rgbs, base, zeros[:4],
                              rgbs[:4], 0, 1, 0.1, cfg,
                              cap=idx.m * idx.m)
    assert rd == 0

    def compacted(capacity):
        p, v, c, d = extract_pairs_banded(
            idx, jnp.asarray(pos), jnp.asarray(zeros), jnp.asarray(rgbs),
            jnp.asarray(base), jnp.asarray(zeros[:4]),
            jnp.asarray(rgbs[:4]), 0, 1, 0.1, cfg,
            cell_pair_cap=idx.m * idx.m, capacity=capacity)
        s = {tuple(x) for x, ok in zip(np.asarray(p), np.asarray(v))
             if ok}
        return s, int(c), int(d)

    s_full, c_full, d_full = compacted(len(raw) + 64)
    assert s_full == raw and c_full == rc and d_full == 0

    cap = max(len(raw) // 2, 1)
    s_cap, c_cap, d_cap = compacted(cap)
    assert len(s_cap) == cap and s_cap <= raw
    assert c_cap == rc                      # count stays pre-cap exact
    assert d_cap == rc - cap                # overflow counted exactly
