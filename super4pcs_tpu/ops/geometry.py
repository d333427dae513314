"""Jittable geometry kernels: invariants, rigid fit, cloud statistics.

These are vectorized re-designs of the scalar routines in
ref:src/super4pcs/algorithms/match4pcsBase.cc — the per-candidate loops
become batched array ops so thousands of candidates fit one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..options import K_LARGE_NUMBER

_K_SMALL = 1e-4   # kSmallNumber, ref:match4pcsBase.cc:70

#: Similarity-mode scale-consistency gate: the two segment-length ratios
#: of a candidate quad may deviate at most this much from each other
#: (ref:match4pcsBase.cc:402 ``ratioDev > 0.1 -> reject``). Shared with
#: the congruent join, which applies the same gate BEFORE its capacity
#: compaction so scale-inconsistent collisions never crowd out true
#: candidates (they would all be rejected here anyway).
SCALE_RATIO_DEV = 0.1


def clean_invalid_normals(normal: np.ndarray) -> tuple[np.ndarray, int]:
    """Zero out degenerate normals, normalize the rest.

    Vectorized ``Utils::CleanInvalidNormals``
    (ref:src/super4pcs/utils/geometry.h:57-82): normals with
    ``|n|^2 < 0.01`` become zero (and are counted), others are unit
    normalized. Host-side numpy — runs once at load time.
    """
    sq = (normal * normal).sum(axis=1, keepdims=True)
    bad = sq < 0.01
    safe = np.where(bad, 1.0, np.sqrt(sq))
    out = np.where(bad, 0.0, normal / safe).astype(np.float32)
    return out, int(bad.sum())


def dist_segment_to_segment(p1, p2, q1, q2):
    """Closest approach of two 3D segments and the two parametric
    invariants at the closest points.

    Branchless re-derivation of the clamped closest-point computation in
    ref:match4pcsBase.cc:64-131 (the classic segment-segment distance
    with the same kSmallNumber=1e-4 degeneracy gates), expressed with
    ``jnp.where`` so it vmaps over candidate orderings and bases.

    Returns ``(invariant1, invariant2, distance)``.
    """
    u = p2 - p1
    v = q2 - q1
    w = p1 - q1
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    f = a * c - b * b

    # --- s-branch (ref:cc:87-104) ---
    parallel = f < _K_SMALL
    s1_g = b * e - c * d
    t1_g = a * e - b * d
    s_neg = s1_g < 0.0
    s_big = s1_g > f
    # general (non-parallel) case after s-clamping
    s1_np = jnp.where(s_neg, 0.0, jnp.where(s_big, f, s1_g))
    t1_np = jnp.where(s_neg, e, jnp.where(s_big, e + b, t1_g))
    t2_np = jnp.where(s_neg | s_big, c, f)
    s2_np = f

    s1 = jnp.where(parallel, 0.0, s1_np)
    s2 = jnp.where(parallel, 1.0, s2_np)
    t1 = jnp.where(parallel, e, t1_np)
    t2 = jnp.where(parallel, c, t2_np)

    # --- t-branch (ref:cc:106-126) ---
    t_neg = t1 < 0.0
    t_big = t1 > t2

    # t < 0 case
    s1_tneg = jnp.where(-d < 0.0, 0.0, jnp.where(-d > a, s2, -d))
    s2_tneg = jnp.where((-d >= 0.0) & (-d <= a), a, s2)
    # t > t2 case
    db = -d + b
    s1_tbig = jnp.where(db < 0.0, 0.0, jnp.where(db > a, s2, db))
    s2_tbig = jnp.where((db >= 0.0) & (db <= a), a, s2)

    s1 = jnp.where(t_neg, s1_tneg, jnp.where(t_big, s1_tbig, s1))
    s2 = jnp.where(t_neg, s2_tneg, jnp.where(t_big, s2_tbig, s2))
    t1 = jnp.where(t_neg, 0.0, jnp.where(t_big, t2, t1))

    def _safe_div(num, den):
        ok = jnp.abs(den) > 1e-30
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    invariant1 = jnp.where(jnp.abs(s1) < _K_SMALL, 0.0, _safe_div(s1, s2))
    invariant2 = jnp.where(jnp.abs(t1) < _K_SMALL, 0.0, _safe_div(t1, t2))

    closest = w + invariant1[..., None] * u - invariant2[..., None] * v
    dist = jnp.linalg.norm(closest, axis=-1)
    return invariant1, invariant2, dist


# The 12 (i, j, k, l) orderings scanned by TryQuadrilateral
# (ref:match4pcsBase.cc:231-238): all ordered (i, j) with i != j, and
# (k, l) the remaining indices in ascending order.
_QUAD_ORDERINGS = np.array(
    [(i, j, k, l)
     for i in range(4) for j in range(4) if i != j
     for k in [next(x for x in range(4) if x not in (i, j))]
     for l in [next(x for x in range(4) if x not in (i, j, k))]],
    dtype=np.int32,
)  # (12, 4)


def try_quadrilateral(quad_pos: jnp.ndarray):
    """Best pairing of a 4-point base into two segments.

    Vectorized ``TryQuadrilateral`` (ref:match4pcsBase.cc:225-274): all
    12 orderings evaluated at once, the one whose two segments pass
    closest is kept.

    Args:
      quad_pos: (4, 3) base point positions.
    Returns:
      (perm, invariant1, invariant2): ``perm`` is the (4,) index
      permutation to apply to the base ids/points.
    """
    orderings = jnp.asarray(_QUAD_ORDERINGS)
    pts = quad_pos[orderings]          # (12, 4, 3)
    inv1, inv2, dist = dist_segment_to_segment(
        pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3])
    best = jnp.argmin(dist)
    return orderings[best], inv1[best], inv2[best]


def batched_rigid_fit(ref_quad, cand_quads, centroid1, centroid2,
                      max_angle_rad, estimate_scale: bool = False):
    """Fit rigid transforms aligning each candidate quad onto the base.

    Batched form of ``ComputeRigidTransformation``
    (ref:match4pcsBase.cc:365-500, computeScale=false path): orthonormal
    frames from the first three points of each quad, R = Rp^T Rq, the
    same orthogonality / max-angle gates, and the same 3-point RMS
    divided by 4.

    Args:
      ref_quad:   (4, 3) base points (centered-P frame).
      cand_quads: (C, 4, 3) candidate points (centered-Q frame).
      centroid1:  (3,) centroid of the base's first three points.
      centroid2:  (C, 3) centroid of each candidate's first three points.
      max_angle_rad: scalar; negative disables the angle gate
        (ref:cc:457-472).
    Returns:
      (transform (C, 4, 4), rms (C,), valid (C,)). Invalid candidates get
      rms = kLargeNumber.
    """
    eps = 1e-6  # kSmallNumber, ref:cc:377

    scale = jnp.ones(cand_quads.shape[0], dtype=cand_quads.dtype)
    scale_ok = jnp.ones(cand_quads.shape[0], dtype=bool)
    if estimate_scale:
        # similarity mode (the reference MULTISCALE path,
        # ref:cc:390-414): scale from the two segment-length ratios,
        # rejected when they deviate > 10% from each other
        def seg_len(a, b):
            return jnp.linalg.norm(a - b, axis=-1)
        r1 = seg_len(ref_quad[1], ref_quad[0]) / jnp.maximum(
            seg_len(cand_quads[:, 1], cand_quads[:, 0]), 1e-30)
        r2 = seg_len(ref_quad[3], ref_quad[2]) / jnp.maximum(
            seg_len(cand_quads[:, 3], cand_quads[:, 2]), 1e-30)
        scale_ok = (jnp.abs(r1 / jnp.maximum(r2, 1e-30) - 1.0)
                    <= SCALE_RATIO_DEV)
        scale = 0.5 * (r1 + r2)
        cand_quads = cand_quads * scale[:, None, None]
        centroid2 = centroid2 * scale[:, None]

    def frame(p0, p1, p2):
        # NB: exact 1/sqrt, not lax.rsqrt — the approximate rsqrt's
        # ~1e-3 relative error breaks the (R R)_ii - 1 <= 1e-6
        # orthogonality gate below.
        def unit(v):
            n = jnp.sum(v * v, axis=-1)
            return v / jnp.sqrt(jnp.maximum(n, 1e-30))[..., None], n

        v1, n1 = unit(p1 - p0)
        v2, n2 = unit((p2 - p0)
                      - jnp.sum((p2 - p0) * v1, axis=-1)[..., None] * v1)
        v3, n3 = unit(jnp.cross(v1, v2))
        ok = (n1 > 0) & (n2 > 0) & (n3 > 0)
        return jnp.stack([v1, v2, v3], axis=-2), ok   # rows are the frame

    rot_p, ok_p = frame(ref_quad[0], ref_quad[1], ref_quad[2])      # (3,3)
    rot_q, ok_q = frame(cand_quads[:, 0], cand_quads[:, 1],
                        cand_quads[:, 2])                           # (C,3,3)

    # R = Rp^T Rq  (ref:cc:449)
    rotation = jnp.einsum('ij,cik->cjk', rot_p, rot_q,
                          precision=jax.lax.Precision.HIGHEST)

    # Orthogonality gate exactly as written in the reference:
    # diag(R @ R) - 1 > eps  (ref:cc:453 uses rotation*rotation, not R^T R).
    rr_diag = jnp.einsum('cij,cji->ci', rotation, rotation,
                         precision=jax.lax.Precision.HIGHEST)
    ortho_ok = jnp.all(rr_diag - 1.0 <= eps, axis=-1)

    # Euler-angle gate (ref:cc:457-472), active when max_angle >= 0.
    ang_x = jnp.abs(jnp.arctan2(rotation[:, 2, 1], rotation[:, 2, 2]))
    ang_y = jnp.abs(jnp.arctan2(
        -rotation[:, 2, 0],
        jnp.sqrt(rotation[:, 2, 1] ** 2 + rotation[:, 2, 2] ** 2)))
    ang_z = jnp.abs(jnp.arctan2(rotation[:, 1, 0], rotation[:, 0, 0]))
    angle_ok = jnp.where(
        max_angle_rad >= 0,
        (ang_x <= max_angle_rad) & (ang_y <= max_angle_rad)
        & (ang_z <= max_angle_rad),
        True)

    # RMS over the first three points (ref:cc:477-489; sum / 4).
    first = cand_quads[:, :3, :] - centroid2[:, None, :]           # (C,3,3)
    transformed = jnp.einsum('cij,ckj->cki', rotation, first,
                             precision=jax.lax.Precision.HIGHEST)
    resid = transformed - (ref_quad[None, :3, :] - centroid1)
    rms = jnp.linalg.norm(resid, axis=-1).sum(axis=-1) / 4.0

    # transform: x -> R (x - c2) + c1  (ref:cc:491-497, scale = 1)
    t = centroid1 - jnp.einsum('cij,cj->ci', rotation, centroid2,
                               precision=jax.lax.Precision.HIGHEST)
    transform = (jnp.zeros((cand_quads.shape[0], 4, 4))
                 .at[:, :3, :3].set(rotation)
                 .at[:, :3, 3].set(t)
                 .at[:, 3, 3].set(1.0))

    if estimate_scale:
        # linear part becomes scale * R; translation already uses the
        # scaled centroid (transform = T(c1) R S T(-c2), ref:cc:491-497)
        transform = transform.at[:, :3, :3].multiply(
            scale[:, None, None])

    valid = ok_p & ok_q & ortho_ok & angle_ok & scale_ok
    rms = jnp.where(valid, rms, K_LARGE_NUMBER)
    return transform, rms, valid


def transform_points(mat, pos):
    """Apply homogeneous 4x4 ``mat`` to (N, 3) positions."""
    return pos @ mat[:3, :3].T + mat[:3, 3]


def global_transform(transform, qcentroid1, qcentroid2,
                     centroid_p, centroid_q):
    """Recompose the centered-frame transform into original coordinates.

    Mirrors the getGlobalTransform lambdas
    (ref:match4pcsBase.hpp:224-229, 449-456): keep the rotation block,
    rebuild the translation as
    ``qc1 + cP - R (qc2 + cQ)`` (scale = 1; the reference splits R into
    rotation*scale via computeRotationScaling, identity here).
    """
    rot = transform[..., :3, :3]
    t = (qcentroid1 + centroid_p
         - jnp.einsum('...ij,...j->...i', rot, qcentroid2 + centroid_q,
                      precision='highest'))
    out = transform.at[..., :3, 3].set(t) if hasattr(transform, "at") else None
    if out is None:
        out = np.array(transform)
        out[..., :3, 3] = t
    return out


def estimate_diameter(pos: np.ndarray, n_trials: int,
                      rng: np.random.Generator) -> float:
    """Randomized diameter estimate: max distance over random pairs
    (ref:match4pcsBase.hpp:155-164 — note the reference draws the pairs
    from the *Q* samples; the caller decides which cloud to pass)."""
    n = pos.shape[0]
    a = rng.integers(0, n, size=n_trials)
    b = rng.integers(0, n, size=n_trials)
    d = np.linalg.norm(pos[a] - pos[b], axis=1)
    return float(d.max())


# NOTE: the reference also computes a P_mean_distance_ via MeanDistance()
# (ref:match4pcsBase.cc:158-182) but its only consumer is commented out
# (ref:match4pcsBase.hpp:171 "// delta = P_mean_distance_ * delta;") —
# dead weight in the reference, deliberately not ported (the round-1
# port of it was removed as unwired code).
