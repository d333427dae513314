"""LCP scorer vs a direct nearest-neighbor oracle (the role of the
reference's kd-tree Verify, ref:match4pcsBase.cc:504-567)."""

import functools

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops import lcp


def oracle_lcp(transform, q_pos, p_pos, eps):
    tq = q_pos @ transform[:3, :3].T + transform[:3, 3]
    d2 = ((tq[:, None, :] - p_pos[None, :, :]) ** 2).sum(-1).min(1)
    return (d2 <= eps * eps).mean()


def test_identity_self_match(rng):
    pos = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    score = lcp.lcp_score_single(
        jnp.eye(4), jnp.asarray(pos), jnp.asarray(pos), 1e-5)
    assert float(score) == 1.0


def test_matches_oracle_batched(rng, make_transform):
    q = rng.uniform(-1, 1, size=(150, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, size=(700, 3)).astype(np.float32)
    transforms = np.stack([make_transform() for _ in range(7)])
    eps = 0.15
    got = np.asarray(lcp.lcp_scores(
        jnp.asarray(transforms), jnp.asarray(q), jnp.asarray(p), eps))
    for c in range(7):
        expected = oracle_lcp(transforms[c], q, p, eps)
        assert abs(got[c] - expected) < 1e-6, (c, got[c], expected)


def test_blocking_invariance(rng, make_transform):
    # p_block smaller than Np exercises the running-min scan path
    q = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    p = rng.uniform(-1, 1, size=(333, 3)).astype(np.float32)
    t = jnp.asarray(make_transform())[None]
    a = lcp.lcp_scores(t, jnp.asarray(q), jnp.asarray(p), 0.2, p_block=64)
    b = lcp.lcp_scores(t, jnp.asarray(q), jnp.asarray(p), 0.2, p_block=512)
    assert float(a[0]) == float(b[0])


def test_perfect_alignment_scores_one(rng, make_transform):
    p = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    mat = make_transform()
    inv = np.linalg.inv(mat)
    q = (p @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    score = lcp.lcp_scores(jnp.asarray(mat)[None], jnp.asarray(q),
                           jnp.asarray(p), 1e-3)
    assert float(score[0]) == 1.0


def test_two_stage_matches_full(rng):
    """The two-stage verify must select the same best candidate as full
    scoring whenever a clearly-good candidate exists."""
    from super4pcs_tpu.ops.lcp import lcp_scores, lcp_scores_two_stage
    p = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
    q = p[rng.permutation(800)[:300]]
    # candidate 0: identity (the true match); rest: random junk
    mats = [np.eye(4, dtype=np.float32)]
    for _ in range(511):
        a = rng.normal(size=(3, 3)).astype(np.float32)
        qq, _ = np.linalg.qr(a)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = qq
        m[:3, 3] = rng.uniform(-1, 1, 3)
        mats.append(m)
    mats = jnp.asarray(np.stack(mats))
    qd, pd = jnp.asarray(q), jnp.asarray(p)
    full = lcp_scores(mats, qd, pd, 0.02)
    two, sel = lcp_scores_two_stage(mats, qd, pd, 0.02,
                                    coarse_q=48, coarse_p=256, top_k=64)
    best_full = int(jnp.argmax(full))
    best_two = int(sel[jnp.argmax(two)])
    assert best_full == best_two == 0
    assert abs(float(full[0]) - float(jnp.max(two))) < 1e-6


def test_two_stage_mid_stage_respects_live_mask(rng):
    """Dead buffer slots (index-0-clamped duplicates) must not flood the
    mid-resolution keep=64 selection when live candidates < top_k.

    Repro of the round-1 advisor finding: transforms[0] is a dead slot
    duplicated into every other dead slot and scores 1.0; the only live
    candidate scores lower. Without re-masking at the mid stage, all 64
    survivors are dead and the step would return LCP -1 while a live
    candidate existed."""
    from super4pcs_tpu.ops.lcp import lcp_scores, lcp_scores_two_stage
    p = rng.uniform(-1, 1, size=(1400, 3)).astype(np.float32)
    q = p[rng.permutation(1400)[:1100]] - np.float32([0.35, 0.0, 0.0])

    perfect = np.eye(4, dtype=np.float32)
    perfect[:3, 3] = [0.35, 0.0, 0.0]          # q -> p exactly (LCP 1.0)
    off = perfect.copy()
    off[:3, 3] += [0.06, 0.0, 0.0]             # offset > delta: mediocre
    c = 128
    mats = np.tile(perfect, (c, 1, 1))         # dead slots = clones of [0]
    mats[5] = off
    live = np.zeros(c, bool)
    live[5] = True

    qd, pd = jnp.asarray(q), jnp.asarray(p)
    mats = jnp.asarray(mats)
    two, sel = lcp_scores_two_stage(mats, qd, pd, 0.05,
                                    top_k=96, live=jnp.asarray(live))
    masked = jnp.where(jnp.asarray(live)[sel], two, -1.0)
    best = int(sel[jnp.argmax(masked)])
    assert best == 5, f"live candidate evicted (best={best})"
    want = float(lcp_scores(mats[5:6], qd, pd, 0.05)[0])
    assert abs(float(jnp.max(masked)) - want) < 1e-6


def test_pallas_kernel_parity_interpreted(rng):
    """The Pallas kernel math, run in interpreter mode on CPU, matches
    the XLA oracle exactly."""
    from super4pcs_tpu.kernels import lcp_pallas
    import jax
    from unittest import mock
    p = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (90, 3)).astype(np.float32)
    tq = jnp.asarray(q)
    with mock.patch.object(lcp_pallas.pl, "pallas_call",
                           functools.partial(lcp_pallas.pl.pallas_call,
                                             interpret=True)):
        d2 = lcp_pallas.min_sq_dists(tq, jnp.asarray(p))
    ref = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=0, atol=1e-7)


def test_streamed_kernel_parity_interpreted(rng):
    """The streamed-P kernel (P beyond VMEM residency) matches brute
    force, in interpreter mode on CPU."""
    from super4pcs_tpu.kernels import lcp_pallas
    from unittest import mock
    p = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
    tq = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
    with mock.patch.object(lcp_pallas.pl, "pallas_call",
                           functools.partial(lcp_pallas.pl.pallas_call,
                                             interpret=True)):
        d2 = lcp_pallas.min_sq_dists_streamed(
            jnp.asarray(tq), jnp.asarray(p))
    ref = ((tq[:, None, :] - p[None, :, :]) ** 2).sum(-1).min(1)
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=0, atol=1e-7)


def test_candidate_kernel_small_q_parity_interpreted(rng):
    """The in-kernel-transform candidate kernel with an adaptive
    (sub-Q_TILE) query tile — the memory-safe replacement for the
    removed flattened (C*Nq, 8) path, whose 8 -> 128 lane padding OOM'd
    at coarse-verification scale — matches brute force."""
    import functools
    from unittest import mock
    import jax.numpy as jnp
    from super4pcs_tpu.kernels import lcp_pallas

    p = rng.uniform(-1, 1, (700, 3)).astype(np.float32)
    q = rng.uniform(-1, 1, (60, 3)).astype(np.float32)   # < Q_TILE
    mats = []
    for _ in range(5):
        a = rng.normal(size=(3, 3))
        qm, r = np.linalg.qr(a)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = qm * np.sign(np.diag(r))
        m[:3, 3] = rng.uniform(-0.3, 0.3, 3)
        mats.append(m)
    ts = jnp.asarray(np.stack(mats))
    with mock.patch.object(lcp_pallas.pl, "pallas_call",
                           functools.partial(lcp_pallas.pl.pallas_call,
                                             interpret=True)):
        d2 = lcp_pallas.candidate_min_sq_dists(ts, jnp.asarray(q),
                                               jnp.asarray(p))
        d2s = lcp_pallas.candidate_min_sq_dists_streamed(
            ts, jnp.asarray(q), jnp.asarray(p))
    tq = np.einsum('cij,nj->cni', np.stack(mats)[:, :3, :3], q) \
        + np.stack(mats)[:, None, :3, 3]
    ref = ((tq[:, :, None, :] - p[None, None, :, :]) ** 2).sum(-1).min(-1)
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2s), ref, rtol=0, atol=1e-6)
