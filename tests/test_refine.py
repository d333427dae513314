"""Op-level tests for the trimmed-ICP refinement (ops/refine.py):
rigid convergence and the Umeyama similarity fit, independent of the
RANSAC pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from super4pcs_tpu.ops import refine


def bumpy(rng, n):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
            + 0.2 * np.sin(4 * v[:, 2]))
    return (v * bump[:, None]).astype(np.float32)


def rot_z(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]], np.float32)


def small_perturbation(angle, shift):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot_z(angle)
    m[:3, 3] = shift
    return m


@pytest.mark.parametrize("estimate_scale", [False, True])
def test_refine_converges_to_truth(rng, estimate_scale):
    """From a slightly-off pose, trimmed ICP converges to the true
    (rigid or similarity) alignment of a noisy pair."""
    p = bumpy(rng, 400)
    s = 1.5 if estimate_scale else 1.0
    true_lin = s * rot_z(0.8)
    true_t = np.float32([0.2, -0.1, 0.15])
    # q maps onto p by x -> true_lin x + true_t
    q = ((p - true_t) @ np.linalg.inv(true_lin).T).astype(np.float32)
    q += rng.normal(scale=0.005, size=q.shape).astype(np.float32)

    start = np.eye(4, dtype=np.float32)
    start[:3, :3] = true_lin @ rot_z(0.05)
    start[:3, 3] = true_t + np.float32([0.02, -0.01, 0.015])

    out = np.asarray(refine.refine_transform(
        start, jnp.asarray(q), jnp.asarray(p), delta=0.02, iters=8,
        estimate_scale=estimate_scale))

    moved = q @ out[:3, :3].T + out[:3, 3]
    med = np.median(np.linalg.norm(moved - p, axis=1))
    # noise floor in p units: per-axis sigma 0.005 scales by s, and the
    # median 3-D norm is ~1.54 sigma
    assert med < 2.0 * 0.005 * s, med
    est_scale = np.linalg.norm(out[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.02, est_scale
    # rotation recovered: compare unit-scaled linear parts
    r_est = out[:3, :3] / est_scale
    r_true = true_lin / s
    assert np.abs(r_est - r_true).max() < 0.02


def test_rigid_mode_never_scales(rng):
    """Without estimate_scale the linear part stays orthonormal even
    when the data would prefer a scale."""
    p = bumpy(rng, 300)
    q = (p / 1.3).astype(np.float32)             # scaled data
    out = np.asarray(refine.refine_transform(
        np.eye(4, dtype=np.float32), jnp.asarray(q), jnp.asarray(p), delta=0.05, iters=4))
    cols = np.linalg.norm(out[:3, :3], axis=0)
    np.testing.assert_allclose(cols, 1.0, atol=1e-5)


def test_similarity_degenerate_keeps_scale_one(rng):
    """With no correspondences inside the trim radius the Umeyama
    guard keeps scale 1 instead of dividing by ~0."""
    p = bumpy(rng, 100)
    q = p + np.float32([100.0, 0, 0])            # far outside any radius
    out = np.asarray(refine.refine_transform(
        np.eye(4, dtype=np.float32), jnp.asarray(q), jnp.asarray(p), delta=0.01, iters=2,
        estimate_scale=True))
    assert np.isfinite(out).all()
    cols = np.linalg.norm(out[:3, :3], axis=0)
    np.testing.assert_allclose(cols, 1.0, atol=1e-4)
