"""LCP scorer vs a direct nearest-neighbor oracle (the role of the
reference's kd-tree Verify, ref:match4pcsBase.cc:504-567)."""

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
