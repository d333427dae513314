"""Batched multi-pair scan-graph registration (pairs axis).

BASELINE.json config #5: register G independent scan pairs in one SPMD
program — the step is vmapped over a pairs axis and, when a mesh is
given, that axis is sharded across devices (each chip registers its own
subset of pairs; the only cross-device traffic is the final per-pair
result gather — embarrassingly parallel, riding ICI/DCN).

Fixed shapes across pairs are obtained by *repeat-padding*: every
sampled cloud is padded to the batch maximum by repeating its points
cyclically. Duplicated P points are harmless (duplicate congruent
candidates score identically); duplicated Q points re-weight the LCP
denominator toward the repeated points — exact when pads are few,
documented here rather than hidden. The reference has no batch mode at
all (single-pair CLI; its matching test loops pairs serially,
ref:tests/matching.cc:204-348).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..cloud import PointCloud
from ..matcher import (RegistrationResult, build_step, _K_SMALL_ERROR,
                       _K_MIN_TRIALS, _K_DIAMETER_FRACTION)
from ..options import Options, K_NUMBER_OF_DIAMETER_TRIALS
from ..ops import geometry, lcp, refine, sampling

PAIRS_AXIS = "pairs"


def _repeat_pad(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    reps = -(-n // a.shape[0])
    return np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:n]


def _prep(cloud: PointCloud, opts: Options, truncate: bool,
          rng: np.random.Generator):
    sampled = sampling.sample_for_matching(
        cloud, opts.delta, opts.sample_size, truncate=truncate, rng=rng)
    centroid = sampled.pos.mean(axis=0)
    return sampled, centroid


def register_batch(
    pairs: Sequence[Tuple[PointCloud, PointCloud]],
    options: Optional[Options] = None,
    mesh: Optional[Mesh] = None,
    algorithm: str = "super4pcs",
) -> List[RegistrationResult]:
    """Register ``pairs[g] = (P_g, Q_g)`` for all g in one SPMD program.

    When ``mesh`` (1-D, axis 'pairs') is given, G must be divisible by
    the mesh size and the pairs axis is sharded across its devices.
    """
    opts = options or Options()
    cone_tol = opts.cone_cos_tolerance if algorithm == "super4pcs" else -1.0
    g = len(pairs)
    if g == 0:
        return []
    if mesh is not None and g % mesh.size != 0:
        raise ValueError(f"number of pairs ({g}) must be divisible by "
                         f"the mesh size ({mesh.size})")
    rng = np.random.default_rng(opts.random_seed)

    preps = [(_prep(p, opts, False, rng), _prep(q, opts, True, rng))
             for p, q in pairs]
    np_max = max(len(pp) for (pp, _), _ in preps)
    nq_max = max(len(qq) for _, (qq, _) in preps)

    p_pos = np.stack([_repeat_pad(pp.pos - cp, np_max)
                      for (pp, cp), _ in preps])
    p_norm = np.stack([_repeat_pad(pp.normals_or_zero(), np_max)
                       for (pp, _), _ in preps])
    p_rgb = np.stack([_repeat_pad(pp.rgb_or_invalid(), np_max)
                      for (pp, _), _ in preps])
    q_pos = np.stack([_repeat_pad(qq.pos - cq, nq_max)
                      for _, (qq, cq) in preps])
    q_norm = np.stack([_repeat_pad(qq.normals_or_zero(), nq_max)
                       for _, (qq, _) in preps])
    q_rgb = np.stack([_repeat_pad(qq.rgb_or_invalid(), nq_max)
                      for _, (qq, _) in preps])
    cent_p = np.stack([cp for (_, cp), _ in preps])
    cent_q = np.stack([cq for _, (_, cq) in preps])

    diams = np.asarray([
        geometry.estimate_diameter(q_pos[i], K_NUMBER_OF_DIAMETER_TRIALS,
                                   rng)
        for i in range(g)], np.float32)

    # trial estimate from the worst pair (ref:hpp:175-185 semantics)
    import math
    overlap = opts.overlap_estimation
    denom = math.log(max(1.0 - overlap ** _K_MIN_TRIALS, 1e-300))
    first_estimation = math.log(_K_SMALL_ERROR) / denom if denom else 0.0
    n_trials = max(int(first_estimation / _K_DIAMETER_FRACTION),
                   _K_MIN_TRIALS)

    step, _ = build_step(opts, nq_max, cone_tol)
    vstep = jax.vmap(step)

    if mesh is not None:
        pspec = P(PAIRS_AXIS)
        vstep = shard_map(
            vstep, mesh=mesh,
            in_specs=(pspec,) * 8, out_specs=pspec, check_vma=False)
    vstep = jax.jit(vstep)

    d = lambda x: jnp.asarray(x, jnp.float32)
    arrays = (d(p_pos), d(p_norm), d(p_rgb), d(q_pos), d(q_norm), d(q_rgb))
    diam_dev = d(diams)
    key = jax.random.key(opts.random_seed)

    # initial LCP of the identity per pair (ref:hpp:201)
    init_scores = np.asarray(jax.vmap(
        lambda qp, pp: lcp.lcp_score_single(
            jnp.eye(4, dtype=jnp.float32), qp, pp, opts.delta)
    )(arrays[3], arrays[0]))

    best = {
        "lcp": init_scores.copy(),
        "transform": np.tile(np.eye(4, dtype=np.float32), (g, 1, 1)),
        "qcentroid1": np.zeros((g, 3), np.float32),
        "qcentroid2": np.zeros((g, 3), np.float32),
    }
    improved = np.zeros(g, bool)

    t0 = time.perf_counter()
    trial = 0
    step_idx = 0
    while True:
        keys = jax.vmap(
            lambda k: jax.random.split(k, opts.bases_per_step))(
            jax.random.split(jax.random.fold_in(key, step_idx), g))
        out = vstep(keys, diam_dev, *arrays)
        lcps = np.asarray(out["lcp"])
        upd = lcps > best["lcp"]
        improved |= upd
        for name in ("lcp", "transform", "qcentroid1", "qcentroid2"):
            vals = np.asarray(out[name])
            best[name][upd] = vals[upd]
        trial += opts.bases_per_step
        step_idx += 1
        elapsed = time.perf_counter() - t0
        fraction = max(trial / n_trials, elapsed / opts.max_time_seconds)
        if (fraction >= 0.99 or trial > n_trials
                or (best["lcp"] >= opts.terminate_threshold).all()):
            break

    # guarded trimmed-ICP polish, vmapped over the pairs axis (same
    # contract as the single-pair matcher: kept only if LCP improves)
    if opts.refine_iterations > 0:
        cur = jnp.asarray(best["transform"])
        refined = jax.jit(jax.vmap(
            lambda t, qp, pp: refine.refine_transform(
                t, qp, pp, opts.delta, iters=opts.refine_iterations)
        ))(cur, arrays[3], arrays[0])
        both = jnp.stack([cur, refined], axis=1)        # (G, 2, 4, 4)
        scores = jax.jit(jax.vmap(
            lambda ts, qp, pp: lcp.lcp_scores(ts, qp, pp, opts.delta,
                                              use_pallas=False)
        ))(both, arrays[3], arrays[0])
        scores = np.asarray(scores)
        refined = np.asarray(refined)
        for i in range(g):
            if scores[i, 1] > best["lcp"][i]:
                best["lcp"][i] = scores[i, 1]
                best["transform"][i] = refined[i]
                best["qcentroid1"][i] = refined[i, :3, 3]
                best["qcentroid2"][i] = 0.0
                improved[i] = True

    results = []
    for i in range(g):
        if improved[i]:
            mat = np.array(best["transform"][i])
            rot = mat[:3, :3]
            mat[:3, 3] = (best["qcentroid1"][i] + cent_p[i]
                          - rot @ (best["qcentroid2"][i] + cent_q[i]))
            moved = pairs[i][1].transformed(mat)
        else:
            mat = np.eye(4, dtype=np.float32)
            moved = pairs[i][1]
        results.append(RegistrationResult(
            score=float(best["lcp"][i]), transform=mat,
            transformed_q=moved, n_trials=trial,
            improved=bool(improved[i]), stats={}))
    return results
