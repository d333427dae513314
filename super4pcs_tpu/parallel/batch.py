"""Batched multi-pair scan-graph registration (pairs axis).

BASELINE.json config #5: register G independent scan pairs in one SPMD
program — the step is vmapped over a pairs axis and, when a mesh is
given, that axis is sharded across devices (each chip registers its own
subset of pairs; the only cross-device traffic is the final per-pair
result gather — embarrassingly parallel, riding ICI/DCN).

Fixed shapes across pairs are obtained by padding every sampled cloud to
the batch maximum. P clouds are *repeat*-padded (duplicate P points
never change a min-distance, so LCP and congruent scoring are exact).
Q clouds are *sentinel*-padded: pad rows sit at the far ``ops.lcp.Q_PAD``
coordinate, where the pair-distance filter can never select them and the
LCP denominator masks them out — a padded pair's LCP is exactly its
unpadded LCP (tests/test_parallel.py::test_sentinel_padded_lcp_exact).
The reference has no batch mode at all (single-pair CLI; its matching
test loops pairs serially, ref:tests/matching.cc:204-348).

Each result carries the same stats dict as the single-pair matcher
(overflow telemetry, n_congruent, search/compile seconds), and the run
supports the visitor stream and checkpoint/resume contracts
(``batch_state`` out / ``resume_state`` in).

Known sentinel caveat: in ``estimate_scale`` mode the pair-distance
filter is off, so sentinel-sentinel pairs can enter the pair buffers
(they never join with real invariant points and never win LCP, but they
waste capacity) — prefer uniform cloud sizes for scale-mode batches.

Coarse-search note: an explicit ``Options.search_delta_factor`` applies
to every pair of the batch (per-pair rank-best transforms are tracked
and redeemed through the guarded refine stage — requires
``refine_iterations`` > 0, the default). The single-pair matcher's
*auto escalation* (``search_escalation_factor``) maps onto the batch as
**straggler redemption**: the batch program itself never escalates (one
fused program for all pairs — recompiling and re-stepping everyone for
a few hard pairs wastes the fleet), but after the batch loop, pairs
still below the terminate threshold are re-registered INDIVIDUALLY
through the single-pair matcher at the escalated search factor,
worst-first, within whatever wall-clock budget remains. A redeemed
pair's result replaces its batch result only when its LCP improves.
Single-process runs only (multi-host processes would race the serial
redemption loop); disable with ``search_escalation_factor`` <=
``search_delta_factor``.
"""

from __future__ import annotations

import math
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..cloud import PointCloud
from ..matcher import (RegistrationResult, build_step, _K_SMALL_ERROR,
                       _K_MIN_TRIALS, _K_DIAMETER_FRACTION,
                       resolve_bases_per_step, resolve_pair_engine)
from ..ops.band_extract import build_batched_band_index
from ..options import Options, K_NUMBER_OF_DIAMETER_TRIALS
from ..ops import geometry, lcp, refine, sampling
from ..visitor import DummyTransformVisitor, visitor_needs_global

PAIRS_AXIS = "pairs"

# Q-side sentinel coordinate — beyond ops.lcp.Q_PAD so the masked LCP
# denominator excludes these rows (see ops/lcp.py::q_valid_mask).
_Q_SENTINEL = 2.0 * lcp.Q_PAD


def _repeat_pad(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    reps = -(-n // a.shape[0])
    return np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:n]


def _sentinel_pad(pos: np.ndarray, n: int) -> np.ndarray:
    if pos.shape[0] == n:
        return pos
    pad = np.full((n - pos.shape[0], 3), _Q_SENTINEL, pos.dtype)
    return np.concatenate([pos, pad])


def _zero_pad(a: np.ndarray, n: int, value: float) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], value, a.dtype)
    return np.concatenate([a, pad])


def _prep(cloud: PointCloud, opts: Options, truncate: bool,
          rng: np.random.Generator):
    # scale mode caps the Q sample exactly like the single-pair matcher
    # (Options.scale_max_q): without the cap an estimate_scale batch
    # with sample_size > 2048 would auto-select the allpairs engine per
    # vmapped pair — G * B * nq^2 implicit table rows, an HBM OOM at
    # modest batch sizes. P keeps its full sample (truncate=False).
    target = opts.sample_size
    if truncate and opts.estimate_scale and target > opts.scale_max_q:
        target = opts.scale_max_q
    sampled = sampling.sample_for_matching(
        cloud, opts.delta, target, truncate=truncate, rng=rng)
    centroid = sampled.pos.mean(axis=0)
    return sampled, centroid


def register_batch(
    pairs: Sequence[Tuple[PointCloud, PointCloud]],
    options: Optional[Options] = None,
    mesh: Optional[Mesh] = None,
    algorithm: str = "super4pcs",
    visitor=None,
    resume_state: Optional[dict] = None,
    on_checkpoint=None,
) -> List[RegistrationResult]:
    """Register ``pairs[g] = (P_g, Q_g)`` for all g in one SPMD program.

    When ``mesh`` (1-D, axis 'pairs') is given, G must be divisible by
    the mesh size and the pairs axis is sharded across its devices.

    ``visitor``: optional callable ``visitor(fraction, scores, mats)``
    with per-pair arrays ``scores (G,)`` / ``mats (G, 4, 4)`` — called
    once before the loop (fraction 0), after every improving step
    (fraction -1, matching the single-pair improvement convention,
    ref:hpp:458-465) and every step (progress fraction). When the
    visitor answers ``needs_global_transformation() == True`` the mats
    are recomposed into original coordinates.

    ``resume_state``: dict returned in ``results[g].stats["batch_state"]``
    of a previous (possibly interrupted) run over the *same pairs and
    options* — the search resumes from its trial counter and per-pair
    best-so-far, continuing the same PRNG stream.

    ``on_checkpoint``: optional callable receiving the serializable
    state dict after every device step — the fault-tolerance hook for
    preemptible runs: persist it (every process holds an identical
    replica, so any host may write it) and a fresh job passing it as
    ``resume_state`` continues where the dead one stopped
    (tests/test_distributed.py::test_two_process_crash_resume).
    """
    opts = options or Options()
    cone_tol = opts.cone_cos_tolerance if algorithm == "super4pcs" else -1.0
    visitor = visitor or DummyTransformVisitor()
    needs_global = visitor_needs_global(visitor)
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
    nq_real = np.asarray([len(qq) for _, (qq, _) in preps])
    if opts.bases_per_step is None:
        opts = opts.replace(
            bases_per_step=resolve_bases_per_step(opts, nq_max))

    p_pos = np.stack([_repeat_pad(pp.pos - cp, np_max)
                      for (pp, cp), _ in preps])
    p_norm = np.stack([_repeat_pad(pp.normals_or_zero(), np_max)
                       for (pp, _), _ in preps])
    p_rgb = np.stack([_repeat_pad(pp.rgb_or_invalid(), np_max)
                      for (pp, _), _ in preps])
    q_pos = np.stack([_sentinel_pad(qq.pos - cq, nq_max)
                      for _, (qq, cq) in preps])
    q_norm = np.stack([_zero_pad(qq.normals_or_zero(), nq_max, 0.0)
                       for _, (qq, _) in preps])
    q_rgb = np.stack([_zero_pad(qq.rgb_or_invalid(), nq_max, -1.0)
                      for _, (qq, _) in preps])
    cent_p = np.stack([cp for (_, cp), _ in preps])
    cent_q = np.stack([cq for _, (_, cq) in preps])

    # diameter from the *unpadded* samples (sentinel rows would blow the
    # estimate up by ~Q_PAD/extent)
    diams = np.asarray([
        geometry.estimate_diameter(
            preps[i][1][0].pos - cent_q[i], K_NUMBER_OF_DIAMETER_TRIALS,
            rng)
        for i in range(g)], np.float32)

    # trial estimate from the worst pair (ref:hpp:175-185 semantics)
    overlap = opts.overlap_estimation
    denom = math.log(max(1.0 - overlap ** _K_MIN_TRIALS, 1e-300))
    first_estimation = math.log(_K_SMALL_ERROR) / denom if denom else 0.0
    n_trials = max(int(first_estimation / _K_DIAMETER_FRACTION),
                   _K_MIN_TRIALS)

    tc = time.perf_counter()
    # banded x batch (the reference's one scaling mechanism works for
    # every caller, ref:src/super4pcs/algorithms/super4pcs.h:33-45):
    # when the resolved engine for nq_max is "banded", build per-pair
    # band indexes padded to one shared shape and vmap the step over
    # them — no more silent rowcap downgrade (which is measured to OOM
    # past nq=32768, BASELINE.md r3).
    band_b = None
    if resolve_pair_engine(opts, nq_max) == "banded":
        band_b = build_batched_band_index(
            [q_pos[i] for i in range(g)], opts.delta,
            cell_budget=opts.band_cell_budget)
    step, (k_pairs, k_quads, _) = build_step(opts, nq_max, cone_tol,
                                             band_index=band_b)
    vstep = jax.vmap(step)
    n_procs = jax.process_count()
    n_in = 8 if band_b is None else 9

    if mesh is not None:
        pspec = P(PAIRS_AXIS)

        def spmd(keys, diam, *arrs):
            local = vstep(keys, diam, *arrs)
            # replicate the (tiny) per-pair outputs so every process —
            # including non-coordinators in a multi-host run — reads
            # them directly (one small all_gather riding ICI/DCN)
            return jax.tree.map(
                lambda x: jax.lax.all_gather(x, PAIRS_AXIS, tiled=True),
                local)

        inner = shard_map(spmd, mesh=mesh,
                          in_specs=(pspec,) * n_in, out_specs=P(),
                          check_vma=False)
    else:
        inner = vstep

    b_per_step = opts.bases_per_step

    def loop_step(key_data, step_i, diam, *arrs):
        # key derivation lives inside the program: multi-host runs then
        # only ship a replicated (2,) uint32 key across the boundary
        key = jax.random.wrap_key_data(key_data)
        keys = jax.vmap(lambda k: jax.random.split(k, b_per_step))(
            jax.random.split(jax.random.fold_in(key, step_i), g))
        return inner(keys, diam, *arrs)

    loop_step = jax.jit(loop_step)

    if mesh is not None and n_procs > 1:
        # multi-host: every process holds the same full numpy inputs;
        # assemble global arrays shard-by-shard (pairs axis over DCN)
        from jax.sharding import NamedSharding
        sh = NamedSharding(mesh, P(PAIRS_AXIS))

        def dev(x):
            x = np.asarray(x)       # dtype-preserving (band int32 leaves)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])

        d = lambda x: dev(np.asarray(x, np.float32))
    else:
        dev = lambda x: jnp.asarray(x)
        d = lambda x: jnp.asarray(x, jnp.float32)
    arrays = (d(p_pos), d(p_norm), d(p_rgb), d(q_pos), d(q_norm), d(q_rgb))
    if band_b is not None:
        arrays = arrays + (jax.tree.map(dev, band_b),)
    diam_dev = d(diams)
    key_data = np.asarray(jax.random.key_data(
        jax.random.key(opts.random_seed)))

    # initial LCP of the identity per pair (ref:hpp:201); computed from
    # the host copies on each process's local devices (identical
    # everywhere, no collectives). The masked denominator makes sentinel
    # padding exact here and below.
    local_q = jnp.asarray(q_pos, jnp.float32)
    local_p = jnp.asarray(p_pos, jnp.float32)
    init_scores = np.asarray(jax.jit(jax.vmap(
        lambda qp, pp: lcp.lcp_score_single(
            jnp.eye(4, dtype=jnp.float32), qp, pp, opts.delta)
    ))(local_q, local_p))
    compile_seconds = time.perf_counter() - tc

    best = {
        "lcp": init_scores.copy(),
        "transform": np.tile(np.eye(4, dtype=np.float32), (g, 1, 1)),
        "qcentroid1": np.zeros((g, 3), np.float32),
        "qcentroid2": np.zeros((g, 3), np.float32),
    }
    # Coarse-search support (explicit Options.search_delta_factor > 1):
    # step winners are selected on the rank metric (sf * delta) and
    # their exact-delta scores are depressed, so additionally track the
    # per-pair rank-best transform and give it to the guarded refine
    # below — the same redemption path the single-pair matcher's
    # _refine_candidate provides. Pointless without refinement (see
    # Options.search_delta_factor).
    rank_best = None
    if opts.search_delta_factor != 1.0 and opts.refine_iterations > 0:
        rank_best = {
            "rank": np.full(g, -np.inf, np.float32),
            "transform": np.tile(np.eye(4, dtype=np.float32), (g, 1, 1)),
        }
    improved = np.zeros(g, bool)
    counters = {name: np.zeros(g, np.int64) for name in
                ("pairs_overflow", "quads_overflow", "cands_overflow",
                 "n_congruent", "cell_dropped", "q_sampled_out")}
    trial = 0
    step_idx = 0
    if resume_state is not None:
        trial = int(resume_state["trial"])
        step_idx = int(resume_state["step_idx"])
        improved = np.asarray(resume_state["improved"], bool).copy()
        for name in best:
            best[name] = np.asarray(resume_state[name],
                                    np.float32).copy()
        for name in counters:
            if name in resume_state["counters"]:
                counters[name] = np.asarray(
                    resume_state["counters"][name], np.int64).copy()

    def global_mats():
        mats = np.tile(np.eye(4, dtype=np.float32), (g, 1, 1))
        for i in range(g):
            if improved[i]:
                mats[i] = best["transform"][i]
                rot = mats[i, :3, :3]
                mats[i, :3, 3] = (best["qcentroid1"][i] + cent_p[i]
                                  - rot @ (best["qcentroid2"][i]
                                           + cent_q[i]))
        return mats

    def visit(fraction):
        mats = global_mats() if needs_global else best["transform"].copy()
        visitor(fraction, best["lcp"].copy(), mats)

    def snapshot_state():
        return {
            "trial": trial, "step_idx": step_idx,
            "improved": improved.tolist(),
            "counters": {k: v.tolist() for k, v in counters.items()},
            **{k: v.tolist() for k, v in best.items()},
        }

    visit(0.0)
    t0 = time.perf_counter()
    while True:
        out = jax.device_get(loop_step(
            key_data, jnp.int32(step_idx), diam_dev, *arrays))
        lcps = np.asarray(out["lcp"])
        upd = lcps > best["lcp"]
        improved |= upd
        for name in ("lcp", "transform", "qcentroid1", "qcentroid2"):
            vals = np.asarray(out[name])
            best[name][upd] = vals[upd]

        # same dropped-ITEM accounting as the single-pair matcher,
        # kept per pair. pair_counts: (G, B, 6) = (c1, c2, qcount,
        # cell_dropped, pairs_dropped, q_sampled_out)
        counts = np.asarray(out["pair_counts"])
        counters["n_congruent"] += np.asarray(out["n_congruent"])
        counters["pairs_overflow"] += counts[:, :, 4].sum(axis=1)
        counters["quads_overflow"] += np.maximum(
            counts[:, :, 2] - k_quads, 0).sum(axis=1)
        counters["cell_dropped"] += counts[:, :, 3].sum(axis=1)
        counters["q_sampled_out"] += counts[:, :, 5].sum(axis=1)
        counters["cands_overflow"] += np.asarray(out["cands_dropped"])

        if rank_best is not None:
            ranks = np.asarray(out["rank_lcp"])
            rupd = (ranks > rank_best["rank"]) & (ranks >= 0)
            rank_best["rank"][rupd] = ranks[rupd]
            rank_best["transform"][rupd] = \
                np.asarray(out["transform"])[rupd]

        trial += opts.bases_per_step
        step_idx += 1
        if on_checkpoint is not None:
            on_checkpoint(snapshot_state())
        if upd.any():
            visit(-1.0)
        elapsed = time.perf_counter() - t0
        if n_procs > 1:
            # the anytime stop rule must be identical on every process
            # (a process breaking the loop while another launches the
            # next collective would deadlock): process 0's clock decides
            from jax.experimental import multihost_utils
            elapsed = float(multihost_utils.broadcast_one_to_all(
                np.float32(elapsed)))
        fraction_time = elapsed / opts.max_time_seconds
        fraction = (fraction_time if opts.use_full_time_budget
                    else max(trial / n_trials, fraction_time))
        visit(min(fraction, 1.0))
        if (fraction >= 0.99
                or (trial > n_trials and not opts.use_full_time_budget)
                or (best["lcp"] >= opts.terminate_threshold).all()):
            break
    search_seconds = time.perf_counter() - t0

    # guarded trimmed-ICP polish, vmapped over the pairs axis (same
    # contract as the single-pair matcher: kept only if LCP improves).
    # In coarse-search mode the per-pair rank-best transforms are
    # refined too — that is how a coarse-ranked winner becomes the best.
    if opts.refine_iterations > 0:
        # refinement runs on the local host copies (identical on every
        # process — deterministic, no collectives needed)
        refine_fn = jax.jit(jax.vmap(
            lambda t, qp, pp: refine.refine_transform(
                t, qp, pp, opts.delta, iters=opts.refine_iterations,
                start_factor=opts.search_delta_factor,
                estimate_scale=opts.estimate_scale)))
        score_fn = jax.jit(jax.vmap(
            lambda ts, qp, pp: lcp.lcp_scores(ts, qp, pp, opts.delta,
                                              use_pallas=False)))
        sources = [best["transform"]]
        if rank_best is not None:
            sources.append(rank_best["transform"])
        for src in sources:
            cur = jnp.asarray(src)
            refined = refine_fn(cur, local_q, local_p)
            both = jnp.stack([cur, refined], axis=1)    # (G, 2, 4, 4)
            scores = np.asarray(score_fn(both, local_q, local_p))
            refined = np.asarray(refined)
            for i in range(g):
                if scores[i, 1] > best["lcp"][i]:
                    best["lcp"][i] = scores[i, 1]
                    best["transform"][i] = refined[i]
                    best["qcentroid1"][i] = refined[i, :3, 3]
                    best["qcentroid2"][i] = 0.0
                    improved[i] = True

    # Straggler redemption (single-pair escalation analog, see module
    # docstring): re-register the pairs still below the terminate
    # threshold individually at the escalated search factor, worst
    # first, while wall budget remains. Each redemption is a fresh
    # single-pair search whose programs hit the persistent XLA cache
    # after the first straggler of a given shape.
    redeemed = {}
    if (opts.search_escalation_factor > opts.search_delta_factor
            and opts.refine_iterations > 0 and n_procs == 1):
        from ..matcher import Match4PCS, MatchSuper4PCS
        cls = MatchSuper4PCS if algorithm == "super4pcs" else Match4PCS
        order = sorted(
            (i for i in range(g)
             if best["lcp"][i] < opts.terminate_threshold),
            key=lambda i: best["lcp"][i])
        for i in order:
            remaining = opts.max_time_seconds - (time.perf_counter() - t0)
            if remaining < max(0.1 * opts.max_time_seconds, 15.0):
                break
            # full-time-budget: the pair already failed one trial
            # estimate in the batch — the redemption pass should use
            # the wall budget, not fail the same estimate again
            sub = opts.replace(
                search_delta_factor=opts.search_escalation_factor,
                max_time_seconds=int(remaining),
                use_full_time_budget=True,
                bases_per_step=None)
            r = cls(sub).compute_transformation(pairs[i][0], pairs[i][1])
            if r.score > best["lcp"][i] and r.improved:
                # kept OUTSIDE the resumable batch_state: the redeemed
                # transform lives in original coordinates (the batch
                # state tracks centered-frame poses); a resumed run
                # simply redeems again
                r.stats["straggler_escalated_to"] = \
                    opts.search_escalation_factor
                redeemed[i] = r

    batch_state = snapshot_state()
    results = []
    for i in range(g):
        if i in redeemed:
            r = redeemed[i]
            stats = {name: int(counters[name][i]) for name in counters}
            stats.update(r.stats, compile_seconds=compile_seconds,
                         q_padded=int(nq_max - nq_real[i]),
                         batch_state=batch_state)
            results.append(RegistrationResult(
                score=r.score, transform=r.transform,
                transformed_q=r.transformed_q,
                n_trials=trial + r.n_trials,
                improved=True, stats=stats))
            continue
        if improved[i]:
            mat = np.array(best["transform"][i])
            rot = mat[:3, :3]
            mat[:3, 3] = (best["qcentroid1"][i] + cent_p[i]
                          - rot @ (best["qcentroid2"][i] + cent_q[i]))
            moved = pairs[i][1].transformed(mat)
        else:
            mat = np.eye(4, dtype=np.float32)
            moved = pairs[i][1]
        stats = {name: int(counters[name][i]) for name in counters}
        stats.update(
            compile_seconds=compile_seconds,
            search_seconds=search_seconds,
            q_padded=int(nq_max - nq_real[i]),
            batch_state=batch_state,
        )
        if band_b is not None:
            stats.update(band_cells=band_b.m,
                         band_member_dropped=band_b.member_dropped)
        results.append(RegistrationResult(
            score=float(best["lcp"][i]), transform=mat,
            transformed_q=moved, n_trials=trial,
            improved=bool(improved[i]), stats=stats))
    return results
