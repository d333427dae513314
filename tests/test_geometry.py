"""Geometry kernel tests: segment invariants vs a literal scalar oracle
of ref:match4pcsBase.cc:64-131, rigid fit recovery, transforms."""

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops import geometry


# --- scalar oracle: literal transcription of the reference control flow ---

def oracle_dist_segment_to_segment(p1, p2, q1, q2):
    kSmall = 1e-4
    u = p2 - p1
    v = q2 - q1
    w = p1 - q1
    a = np.dot(u, u)
    b = np.dot(u, v)
    c = np.dot(v, v)
    d = np.dot(u, w)
    e = np.dot(v, w)
    f = a * c - b * b
    s1, s2, t1, t2 = 0.0, f, 0.0, f
    if f < kSmall:
        s1, s2, t1, t2 = 0.0, 1.0, e, c
    else:
        s1 = b * e - c * d
        t1 = a * e - b * d
        if s1 < 0.0:
            s1, t1, t2 = 0.0, e, c
        elif s1 > s2:
            s1, t1, t2 = s2, e + b, c
    if t1 < 0.0:
        t1 = 0.0
        if -d < 0.0:
            s1 = 0.0
        elif -d > a:
            s1 = s2
        else:
            s1, s2 = -d, a
    elif t1 > t2:
        t1 = t2
        if (-d + b) < 0.0:
            s1 = 0.0
        elif (-d + b) > a:
            s1 = s2
        else:
            s1, s2 = (-d + b), a
    inv1 = 0.0 if abs(s1) < kSmall else s1 / s2
    inv2 = 0.0 if abs(t1) < kSmall else t1 / t2
    dist = np.linalg.norm(w + inv1 * u - inv2 * v)
    return inv1, inv2, dist


def test_invariants_match_oracle(rng):
    cases = rng.uniform(-2, 2, size=(200, 4, 3))
    j1, j2, jd = geometry.dist_segment_to_segment(
        jnp.asarray(cases[:, 0]), jnp.asarray(cases[:, 1]),
        jnp.asarray(cases[:, 2]), jnp.asarray(cases[:, 3]))
    j1, j2, jd = np.asarray(j1), np.asarray(j2), np.asarray(jd)
    for k, pts in enumerate(cases):
        o1, o2, od = oracle_dist_segment_to_segment(*pts)
        assert abs(j1[k] - o1) < 1e-5, (k, o1, j1[k])
        assert abs(j2[k] - o2) < 1e-5, (k, o2, j2[k])
        assert abs(jd[k] - od) < 1e-5, (k, od, jd[k])


def test_invariants_parallel_segments():
    p1 = np.array([0.0, 0.0, 0.0])
    p2 = np.array([1.0, 0.0, 0.0])
    q1 = np.array([0.0, 1.0, 0.0])
    q2 = np.array([1.0, 1.0, 0.0])
    o = oracle_dist_segment_to_segment(p1, p2, q1, q2)
    j = geometry.dist_segment_to_segment(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(q1), jnp.asarray(q2))
    assert abs(float(j[2]) - o[2]) < 1e-6
    assert abs(o[2] - 1.0) < 1e-6


def test_crossing_segments_invariants():
    # planar X: segments (0,0)-(1,0) and (0.5,-0.5)-(0.5,0.5) cross at
    # (0.5, 0) -> inv1 = 0.5, inv2 = 0.5, distance 0
    p1 = jnp.array([0.0, 0.0, 0.0])
    p2 = jnp.array([1.0, 0.0, 0.0])
    q1 = jnp.array([0.5, -0.5, 0.0])
    q2 = jnp.array([0.5, 0.5, 0.0])
    i1, i2, d = geometry.dist_segment_to_segment(p1, p2, q1, q2)
    assert abs(float(i1) - 0.5) < 1e-6
    assert abs(float(i2) - 0.5) < 1e-6
    assert float(d) < 1e-6


def test_try_quadrilateral_picks_crossing_order(rng):
    # A planar quad whose diagonals cross: the best ordering pairs the
    # diagonals (smallest segment-segment distance).
    quad = jnp.array([[0.0, 0.0, 0.0],
                      [1.0, 1.0, 0.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0]])
    perm, inv1, inv2, = geometry.try_quadrilateral(quad)
    pts = quad[perm]
    _, _, d = geometry.dist_segment_to_segment(
        pts[0], pts[1], pts[2], pts[3])
    assert float(d) < 1e-6


def test_rigid_fit_recovers_transform(rng, make_transform):
    mat = make_transform()
    # well-conditioned base (regular tetrahedron) — random thin triangles
    # amplify float32 rounding through the Gram-Schmidt frames
    base = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                    dtype=np.float32)
    # candidate = inverse-transformed base, so fitting candidate->base
    # should recover mat exactly
    inv = np.linalg.inv(mat)
    cand = (base @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    c1 = base[:3].mean(axis=0)
    c2 = cand[:3].mean(axis=0)
    t, rms, valid = geometry.batched_rigid_fit(
        jnp.asarray(base), jnp.asarray(cand)[None],
        jnp.asarray(c1), jnp.asarray(c2)[None], -1.0)
    assert bool(valid[0])
    assert float(rms[0]) < 1e-4
    got = np.asarray(t[0])
    moved = cand @ got[:3, :3].T + got[:3, 3]
    np.testing.assert_allclose(moved, base, atol=1e-3)


def test_rigid_fit_rejects_degenerate(rng):
    base = rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)
    cand = np.zeros((1, 4, 3), dtype=np.float32)  # all-coincident points
    t, rms, valid = geometry.batched_rigid_fit(
        jnp.asarray(base), jnp.asarray(cand),
        jnp.asarray(base[:3].mean(0)), jnp.zeros((1, 3)), -1.0)
    assert not bool(valid[0])
    assert float(rms[0]) >= 1e8


def test_global_transform_composition(rng, make_transform):
    # original-frame consistency: centered transform + centroid bookkeeping
    # must equal direct mapping of original coordinates
    rot = make_transform()[:3, :3]
    centroid_p = rng.normal(size=3).astype(np.float32)
    centroid_q = rng.normal(size=3).astype(np.float32)
    qc1 = rng.normal(size=3).astype(np.float32)
    qc2 = rng.normal(size=3).astype(np.float32)
    centered = np.eye(4, dtype=np.float32)
    centered[:3, :3] = rot
    centered[:3, 3] = qc1 - rot @ qc2
    out = geometry.global_transform(
        jnp.asarray(centered), jnp.asarray(qc1), jnp.asarray(qc2),
        jnp.asarray(centroid_p), jnp.asarray(centroid_q))
    out = np.asarray(out)
    q = rng.normal(size=(10, 3)).astype(np.float32)
    # centered-frame path: center, transform, uncenter
    centered_result = ((q - centroid_q) @ rot.T
                       + (qc1 - rot @ qc2)) + centroid_p
    direct = q @ out[:3, :3].T + out[:3, 3]
    np.testing.assert_allclose(direct, centered_result, atol=1e-5)


def test_clean_invalid_normals():
    normal = np.array([[0.0, 0.0, 0.0],
                       [0.05, 0.0, 0.0],
                       [0.0, 2.0, 0.0],
                       [1.0, 1.0, 1.0]], dtype=np.float32)
    out, n_bad = geometry.clean_invalid_normals(normal)
    assert n_bad == 2
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(np.linalg.norm(out[2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out[3]), 1.0, atol=1e-6)


def test_rigid_fit_with_scale_estimation(rng):
    """Similarity mode (the reference's MULTISCALE path,
    ref:match4pcsBase.cc:390-414): a uniformly scaled candidate quad is
    fit with the scale recovered in the linear part."""
    from super4pcs_tpu.ops.geometry import batched_rigid_fit
    base = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
    s = 1.37
    a = rng.normal(size=(3, 3))
    q_, r_ = np.linalg.qr(a)
    q_ = q_ * np.sign(np.diag(r_))
    if np.linalg.det(q_) < 0:
        q_[:, 0] = -q_[:, 0]
    rot = q_.astype(np.float32)
    t = rng.uniform(-1, 1, 3).astype(np.float32)
    # candidate = inverse-similarity image of the base
    cand = ((base - t) @ rot) / s
    c1 = base[:3].mean(0)
    c2 = cand[:3].mean(0)
    tr, rms, valid = batched_rigid_fit(
        jnp.asarray(base), jnp.asarray(cand[None]),
        jnp.asarray(c1), jnp.asarray(c2[None]), -1.0, estimate_scale=True)
    assert bool(valid[0])
    assert float(rms[0]) < 1e-3
    got = np.asarray(tr[0])
    moved = cand @ got[:3, :3].T + got[:3, 3]
    np.testing.assert_allclose(moved, base, atol=1e-3)
    # linear part carries the scale
    est_scale = np.linalg.norm(got[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.02


def test_rigid_fit_scale_gate_rejects_mismatched_ratios(rng):
    from super4pcs_tpu.ops.geometry import batched_rigid_fit
    base = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
    cand = base.copy()
    cand[3] = base[2] + (base[3] - base[2]) * 2.0   # second segment 2x
    tr, rms, valid = batched_rigid_fit(
        jnp.asarray(base), jnp.asarray(cand[None]),
        jnp.asarray(base[:3].mean(0)), jnp.asarray(cand[None, :3].mean(1)),
        -1.0, estimate_scale=True)
    assert not bool(valid[0])
