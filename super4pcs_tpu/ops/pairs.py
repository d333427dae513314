"""Pair extraction: all point pairs at a base-edge distance, filtered.

TPU-native replacement for both reference engines — the quadratic scan
of ``Match4PCS::ExtractPairs`` (ref:src/super4pcs/algorithms/4pcs.cc:
114-198) and the sphere-rasterization ``IntersectionFunctor`` +
``PairCreationFunctor`` path of Super4PCS (ref:algorithms/super4pcs.cc:
183-224, algorithms/pairCreationFunctor.h:151-218,
accelerators/pairExtraction/intersectionFunctor.h:105-233).

On TPU the adaptive 2^d-tree exists only to dodge O(n^2) on a scalar
CPU; at the sample sizes the algorithm operates on (n <= a few thousand,
pairs are extracted from the *Q samples*), a dense masked n x n
evaluation is faster, exact, and feeds the MXU/VPU directly. Every
filter of the reference's pair predicate is an elementwise mask here:

- distance band   | ||qi - qj|| - d_base | <= eps           (ref:4pcs.cc:142)
- normal band     min(| ||ni-nj|| - a |, | ||ni+nj|| - a |)
                  <= 0.5 * max_normal_difference             (ref:4pcs.cc:145-158)
- color distance  vs the base endpoints' colors              (ref:4pcs.cc:161-171)
- translation     vs the base endpoints' positions           (ref:4pcs.cc:173-179)
- rotation angle  per emission direction                     (ref:4pcs.cc:182-195)

Known reference defects *not* reproduced: in 4pcs.cc the color and
translation rejections execute ``return`` instead of ``continue``,
aborting the whole extraction at the first bad pair; the Super4PCS path
(pairCreationFunctor.h:182-200) applies them per-pair. We implement the
per-pair semantics for both modes.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from .masking import masked_indices


@dataclasses.dataclass(frozen=True)
class PairFilterConfig:
    """Static filter configuration (hashable; closed over by jit)."""
    max_normal_difference: float = -1.0
    max_color_distance: float = -1.0
    max_translation_distance: float = -1.0
    max_angle: float = -1.0
    #: disable the distance band (the reference MULTISCALE mode,
    #: ref:4pcs.cc:141-143 — with unknown scale no distance can filter)
    use_distance_filter: bool = True


def pair_emit_masks(
    pos, normal, rgb,
    base_p0_pos, base_p1_pos,
    base_p0_norm, base_p1_norm,
    base_p0_rgb, base_p1_rgb,
    pair_distance, pair_normals_angle, pair_distance_epsilon,
    cfg: PairFilterConfig,
):
    """Dense (n, n) emission masks for ordered pairs.

    Evaluates the reference pair predicate on the upper triangle
    (p = point j, q = point i, j < i as in ref:4pcs.cc:131-134) and
    returns a full ordered-pair mask where ``emit[u, v]`` means the
    ordered pair (first=u, second=v) is produced.
    """
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]          # [i, j] = q_i - q_j
    dist = jnp.linalg.norm(diff, axis=-1)

    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1).T  # [i, j], j < i
    if cfg.use_distance_filter:
        base = upper & (jnp.abs(dist - pair_distance)
                        <= pair_distance_epsilon)
    else:
        base = upper

    # normal-angle band (applies when enabled and both normals valid)
    if cfg.max_normal_difference > 0:
        nsq = jnp.sum(normal * normal, axis=-1)
        both = (nsq[:, None] > 0) & (nsq[None, :] > 0)
        first_ang = jnp.linalg.norm(
            normal[:, None, :] - normal[None, :, :], axis=-1)
        second_ang = jnp.linalg.norm(
            normal[:, None, :] + normal[None, :, :], axis=-1)
        ndist = jnp.minimum(jnp.abs(first_ang - pair_normals_angle),
                            jnp.abs(second_ang - pair_normals_angle))
        thr = 0.5 * cfg.max_normal_difference * math.pi / 180.0
        base = base & jnp.where(both, ndist <= thr, True)

    # color distance vs the base endpoints (p vs base0, q vs base1)
    if cfg.max_color_distance > 0:
        has = rgb[:, 0] >= 0
        base_has = (base_p0_rgb[0] >= 0) & (base_p1_rgb[0] >= 0)
        use_rgb = has[:, None] & has[None, :] & base_has   # [i, j]
        dp = jnp.linalg.norm(rgb - base_p0_rgb, axis=-1)   # per j (p side)
        dq = jnp.linalg.norm(rgb - base_p1_rgb, axis=-1)   # per i (q side)
        good = (dp[None, :] < cfg.max_color_distance) & \
               (dq[:, None] < cfg.max_color_distance)
        base = base & jnp.where(use_rgb, good, True)

    # translation distance vs the base endpoints
    if cfg.max_translation_distance > 0:
        tp = jnp.linalg.norm(pos - base_p0_pos, axis=-1)
        tq = jnp.linalg.norm(pos - base_p1_pos, axis=-1)
        base = base & (tp[None, :] < cfg.max_translation_distance) & \
                      (tq[:, None] < cfg.max_translation_distance)

    # emission: (j, i) and (i, j), optionally gated by the rotation angle
    if cfg.max_angle > 0:
        seg1 = base_p1_pos - base_p0_pos
        seg1 = seg1 / jnp.linalg.norm(seg1)
        seg2 = diff / jnp.maximum(dist, 1e-30)[..., None]  # [i, j] dir q_i-q_j
        cosang = jnp.clip(jnp.sum(seg2 * seg1, axis=-1), -1.0, 1.0)
        max_rad = cfg.max_angle * math.pi / 180.0
        fwd = jnp.arccos(cosang) <= max_rad     # emit (j, i)
        rev = jnp.arccos(-cosang) <= max_rad    # emit (i, j)
        emit = (base & fwd).T | (base & rev)    # transpose: (j,i) -> [u=j,v=i]
    else:
        emit = base.T | base

    return emit


def extract_pairs(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,   # (4,3) each, the current base
    edge0: int, edge1: int,          # static: (0,1) or (2,3)
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    capacity: int,
):
    """Extract ordered pairs matching one base edge, compacted to a
    static buffer.

    Returns (pairs (capacity, 2) int32, valid (capacity,), count).
    ``count`` is the exact number of pairs pre-cap (overflow telemetry).
    """
    b0p, b1p = base_pos[edge0], base_pos[edge1]
    pair_distance = jnp.linalg.norm(b0p - b1p)
    pair_normals_angle = jnp.linalg.norm(base_norm[edge0] - base_norm[edge1])

    emit = pair_emit_masks(
        pos, normal, rgb,
        b0p, b1p, base_norm[edge0], base_norm[edge1],
        base_rgb[edge0], base_rgb[edge1],
        pair_distance, pair_normals_angle, pair_distance_epsilon, cfg)

    n = pos.shape[0]
    flat_idx, valid, count = masked_indices(emit.reshape(-1), capacity)
    pairs = jnp.stack([flat_idx // n, flat_idx % n], axis=-1)
    return pairs.astype(jnp.int32), valid, count
