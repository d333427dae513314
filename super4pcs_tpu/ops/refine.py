"""Rigid/similarity-transform refinement (trimmed point-to-point ICP).

A quality stage the reference does not have: RANSAC's 4-point fits are
exact only on the base — with noise or discretization the best candidate
often lands at ~80-90% of the achievable LCP. A few trimmed-ICP
iterations on the sampled clouds close that gap. Guarded: the refined
transform is kept only when it does not lower the LCP.

All device work: nearest neighbors reuse the batched min-distance
machinery (argmin via the |a|^2+|b|^2-2ab expansion, exact recompute
like ops/lcp.py), the weighted Kabsch fit is a 3x3 SVD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _nearest(tq, p_pos, p_block: int = 4096):
    """argmin_j ||tq_i - p_j||^2 -> (idx (N,), d2 (N,)); exact d2."""
    n = tq.shape[0]
    tq_sq = jnp.sum(tq * tq, axis=-1)

    npts = p_pos.shape[0]
    pad = (-npts) % p_block
    p_pad = jnp.concatenate(
        [p_pos, jnp.full((pad, 3), 1e18, p_pos.dtype)]) if pad else p_pos
    blocks = p_pad.reshape(-1, p_block, 3)
    p_sq = jnp.sum(blocks * blocks, axis=-1)

    def body(carry, blk):
        best_d2, best_i = carry
        pb, pb_sq, base = blk
        cross = jnp.einsum('ni,mi->nm', tq, pb,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = tq_sq[:, None] + pb_sq[None, :] - 2.0 * cross
        arg = jnp.argmin(d2, axis=-1)
        mn = jnp.take_along_axis(d2, arg[:, None], axis=-1)[:, 0]
        better = mn < best_d2
        return (jnp.where(better, mn, best_d2),
                jnp.where(better, base + arg, best_i)), None

    bases = jnp.arange(blocks.shape[0], dtype=jnp.int32) * p_block
    (_, idx), _ = jax.lax.scan(
        body,
        (jnp.full((n,), jnp.inf, jnp.float32),
         jnp.zeros((n,), jnp.int32)),
        (blocks, p_sq, bases))
    nearest = p_pad[idx]
    d2 = jnp.sum((tq - nearest) ** 2, axis=-1)       # exact recompute
    return idx, d2


def refine_transform(transform, q_pos, p_pos, delta, iters: int = 8,
                     start_factor: float = 1.0,
                     estimate_scale: bool = False):
    """Trimmed ICP from ``transform`` (centered-Q -> centered-P frame).

    Correspondences within the trim radius get weight 1; the weighted
    Kabsch fit (3x3 SVD, reflections repaired) updates the pose each
    iteration. With ``estimate_scale`` the per-iteration fit is the
    Umeyama similarity solution instead — scale
    ``c = trace(diag(1,1,d) S) / sum w ||q - mu_q||^2`` on the same
    SVD — matching the matcher's MULTISCALE mode (the fit is from the
    original q_pos each iteration, so the scale is re-estimated, not
    compounded). The radius anneals geometrically from
    ``2 * delta * start_factor`` down to ``2 * delta`` (the RANSAC rms
    gate band) — with ``start_factor`` 1.0 it is constant, the
    original behavior; with a coarse-search factor
    (Options.search_delta_factor) the wider opening radius matches the
    candidate's location tolerance, so poses found at f x delta still
    fall inside the ICP convergence basin and are pulled to exact-delta
    accuracy by the final iterations.

    Returns the refined (4, 4) transform; callers should re-verify LCP
    and keep the better of the two (see matcher._maybe_refine).
    """
    base = 2.0 * jnp.asarray(delta, jnp.float32)
    if iters > 1:
        sched = jnp.float32(start_factor) ** (
            1.0 - jnp.arange(iters, dtype=jnp.float32) / (iters - 1))
    else:
        sched = jnp.ones((iters,), jnp.float32)
    thr2_sched = (base * sched) ** 2

    def step(mat, thr2):
        tq = q_pos @ mat[:3, :3].T + mat[:3, 3]
        idx, d2 = _nearest(tq, p_pos)
        w = (d2 <= thr2).astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        tgt = p_pos[idx]
        mu_q = jnp.sum(q_pos * w[:, None], axis=0) / wsum
        mu_p = jnp.sum(tgt * w[:, None], axis=0) / wsum
        qc = (q_pos - mu_q) * w[:, None]
        pc = tgt - mu_p
        h = qc.T @ pc                                  # (3, 3)
        u, s, vt = jnp.linalg.svd(h)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        diag = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]).at[2].set(d))
        rot = vt.T @ diag @ u.T
        if estimate_scale:
            # Umeyama: trace(D S) over the weighted Q variance; guard
            # degenerate correspondence sets (keep the incoming scale 1)
            var_q = jnp.sum(jnp.sum(qc * (q_pos - mu_q), axis=-1))
            c = jnp.where(var_q > 1e-20,
                          (s[0] + s[1] + d * s[2])
                          / jnp.maximum(var_q, 1e-20), 1.0)
            rot = c * rot
        t = mu_p - rot @ mu_q
        new = jnp.eye(4, dtype=mat.dtype)
        new = new.at[:3, :3].set(rot).at[:3, 3].set(t)
        return new, None

    out, _ = jax.lax.scan(step, jnp.asarray(transform, jnp.float32),
                          thr2_sched)
    return out
