"""Base (planar 4-point) selection — vmapped RANSAC front end.

Re-design of ``SelectQuadrilateral`` / ``SelectRandomTriangle``
(ref:src/super4pcs/algorithms/match4pcsBase.cc:185-351) for TPU: instead
of a retry-until-success loop per trial, each base draw is a single
fixed-shape program (1000 triangle draws scored at once, one vectorized
coplanar-4th-point scan) returning a validity flag; the matcher runs
many of these per device step under ``vmap`` and simply ignores invalid
ones — at B bases/step the occasional invalid draw costs nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import try_quadrilateral

# Fraction gates from the reference.
_K_BASE_TOO_SMALL = 0.2          # ref:match4pcsBase.cc:283


def select_base(key, p_pos, max_base_diameter, n_triangle_trials: int):
    """Select one planar 4-point base from the (centered) P samples.

    Pipeline (mirrors ref:cc:279-351):
      1. wide-triangle draw: one random first point, ``n_triangle_trials``
         random (second, third) draws; keep the widest triangle whose two
         edges stay under max_base_diameter (ref:cc:185-218);
      2. plane fit A x + B y + C z = 1 through the triangle (ref:cc:310-319);
      3. 4th point: the most coplanar sample not too close to the first
         three (ref:cc:323-338);
      4. best segment pairing + invariants via ``try_quadrilateral``.

    Returns:
      ids (4,) int32 into p_pos, invariant1, invariant2, valid (bool).
    """
    n = p_pos.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)

    first = jax.random.randint(k1, (), 0, n)
    seconds = jax.random.randint(k2, (n_triangle_trials,), 0, n)
    thirds = jax.random.randint(k3, (n_triangle_trials,), 0, n)

    p0 = p_pos[first]
    u = p_pos[seconds] - p0
    w = p_pos[thirds] - p0
    wide = jnp.linalg.norm(jnp.cross(u, w), axis=-1)
    sq_max = max_base_diameter * max_base_diameter
    ok = (jnp.sum(u * u, -1) < sq_max) & (jnp.sum(w * w, -1) < sq_max)
    wide = jnp.where(ok, wide, 0.0)
    best_t = jnp.argmax(wide)
    # reference keeps a candidate only when how_wide > best_wide (starts 0)
    tri_valid = wide[best_t] > 0.0
    b1, b2, b3 = first, seconds[best_t], thirds[best_t]

    # Plane through the three points: solve [p1; p2; p3] [A B C]^T = 1
    # via the same explicit determinant expansion as ref:cc:310-319.
    x1, y1, z1 = p_pos[b1]
    x2, y2, z2 = p_pos[b2]
    x3, y3, z3 = p_pos[b3]
    denom = (-x3 * y2 * z1 + x2 * y3 * z1 + x3 * y1 * z2 - x1 * y3 * z2
             - x2 * y1 * z3 + x1 * y2 * z3)
    plane_valid = denom != 0.0
    safe = jnp.where(plane_valid, denom, 1.0)
    A = (-y2 * z1 + y3 * z1 + y1 * z2 - y3 * z2 - y1 * z3 + y2 * z3) / safe
    B = (x2 * z1 - x3 * z1 - x1 * z2 + x3 * z2 + x1 * z3 - x2 * z3) / safe
    C = (-x2 * y1 + x3 * y1 + x1 * y2 - x3 * y2 - x1 * y3 + x2 * y3) / safe

    # 4th point: most coplanar, not too close to the first three.
    too_small = (max_base_diameter * _K_BASE_TOO_SMALL) ** 2
    d1 = jnp.sum((p_pos - p_pos[b1]) ** 2, -1)
    d2 = jnp.sum((p_pos - p_pos[b2]) ** 2, -1)
    d3 = jnp.sum((p_pos - p_pos[b3]) ** 2, -1)
    far = (d1 >= too_small) & (d2 >= too_small) & (d3 >= too_small)
    plane_dist = jnp.abs(A * p_pos[:, 0] + B * p_pos[:, 1]
                         + C * p_pos[:, 2] - 1.0)
    plane_dist = jnp.where(far, plane_dist, jnp.inf)
    b4 = jnp.argmin(plane_dist)
    fourth_valid = jnp.isfinite(plane_dist[b4])

    ids = jnp.stack([b1, b2, b3, b4]).astype(jnp.int32)
    perm, inv1, inv2 = try_quadrilateral(p_pos[ids])
    ids = ids[perm]

    valid = tri_valid & plane_valid & fourth_valid
    return ids, inv1, inv2, valid
