"""Congruent 4-point set search: invariant-point join of two pair sets.

Replaces both reference variants with one data-parallel join:

- ``Match4PCS::FindCongruentQuadrilaterals`` (ref:src/super4pcs/
  algorithms/4pcs.cc:62-109) builds a temporary kd-tree on the
  invariant points ``e1 = a + inv1 (b - a)`` of the first pair set and
  range-queries it with ``e2 = c + inv2 (d - c)`` of the second;
- ``MatchSuper4PCS::FindCongruentQuadrilaterals`` (ref:algorithms/
  super4pcs.cc:80-177) additionally filters by pair direction through a
  position-grid + direction-bin cone rasterization
  (ref:accelerators/normalset.hpp:162-210).

Here both become a dense masked K x K distance test between the two
invariant-point sets — an MXU-shaped computation — plus, in Super4PCS
mode, an exact cone mask ``|dir1 . dir2 - cos(alpha)| <= tol`` on the
joined candidates. The reference's grid query inspects only the single
cell containing the query point, so it can drop true matches whose
invariant point falls in an adjacent cell; the dense form has no such
misses (it is a superset, then exactly validated).

Threshold quirk kept for parity: both reference variants compare a
*squared* distance against the *unsquared* ``distance_threshold2``
(ref:4pcs.cc:97-99, super4pcs.cc:160), making the effective radius
``sqrt(2 * delta)``. We reproduce that contract (documented, not
accidental) so candidate sets match the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .masking import masked_indices


def invariant_points(pos, pairs, invariant):
    """``e = p_first + invariant * (p_second - p_first)``
    (ref:4pcs.cc:87, super4pcs.cc:123)."""
    a = pos[pairs[:, 0]]
    b = pos[pairs[:, 1]]
    return a + invariant * (b - a)


def pair_directions(pos, pairs):
    d = pos[pairs[:, 1]] - pos[pairs[:, 0]]
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(n, 1e-30)


def find_congruent_quads(
    pos,
    pairs1, valid1,            # (K,2) int32, (K,) bool — base edge (0,1)
    pairs2, valid2,            # (K,2) int32, (K,) bool — base edge (2,3)
    invariant1, invariant2,
    distance_threshold2,       # compared against SQUARED distance (quirk)
    base_cos_alpha,            # cos of the angle between the base segments
    cone_cos_tolerance,        # <0: disable the cone filter (4PCS mode)
    capacity: int,
):
    """Join the two pair sets on invariant-point proximity.

    Returns (quads (capacity, 4) int32 = (a, b, c, d), valid (capacity,),
    count). Quad layout matches ref:super4pcs.cc:172-173:
    (P_pair.first, P_pair.second, Q_pair.first, Q_pair.second) — both
    pair sets index the Q samples.
    """
    e1 = invariant_points(pos, pairs1, invariant1)     # (K1, 3)
    e2 = invariant_points(pos, pairs2, invariant2)     # (K2, 3)

    d2 = jnp.sum((e1[:, None, :] - e2[None, :, :]) ** 2, axis=-1)
    mask = d2 <= distance_threshold2                   # squared-vs-raw quirk
    mask = mask & valid1[:, None] & valid2[None, :]

    if cone_cos_tolerance >= 0:
        dir1 = pair_directions(pos, pairs1)
        dir2 = pair_directions(pos, pairs2)
        cos12 = dir1 @ dir2.T                          # (K1, K2)
        mask = mask & (jnp.abs(cos12 - base_cos_alpha)
                       <= cone_cos_tolerance)

    k2 = pairs2.shape[0]
    flat_idx, valid, count = masked_indices(mask.reshape(-1), capacity)
    i1 = flat_idx // k2
    i2 = flat_idx % k2
    quads = jnp.concatenate([pairs1[i1], pairs2[i2]], axis=-1)
    return quads.astype(jnp.int32), valid, count
