"""Batched-RANSAC registration drivers (4PCS and Super4PCS modes).

Re-architecture of ``Match4PCSBase::ComputeTransformation``
(ref:src/super4pcs/algorithms/match4pcsBase.hpp:61-274) for TPU:

- the reference runs one base per trial, walking branchy CPU structures
  (kd-trees, rasterization grids) and racing threads on a shared
  ``best_LCP_``; here each *device step* vmaps ``bases_per_step``
  complete trials — base selection, pair extraction, congruent-set
  join, rigid fit — then scores every surviving candidate transform
  with one batched LCP kernel and takes an argmax. No shared mutable
  state, no critical sections;
- the anytime contract (ref:hpp:236-255) survives as a host-side loop
  around the jitted step: between steps we check wall-clock budget,
  trial budget, and the terminate threshold, exactly as the reference's
  per-trial checks do;
- RANSAC state worth persisting is an explicit dict (trial counter,
  best transform/LCP, base + congruent ids), so runs checkpoint/resume
  trivially (the reference's ``current_trial_`` resume design,
  ref:match4pcsBase.h:131-161).

Mode differences mirror the reference subclass seam
(ref:match4pcsBase.h:270-326): Super4PCS adds the pair-direction cone
filter in the congruent join; 4PCS joins on invariant distance alone.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cloud import PointCloud
from .options import (Options, DISTANCE_FACTOR, K_LARGE_NUMBER,
                      K_NUMBER_OF_DIAMETER_TRIALS)
from .ops import congruent, geometry, lcp, refine, sampling, select
from .ops.band_extract import build_band_index, extract_pairs_banded_both
from .ops.masking import masked_indices
from .ops.pairs import (PairFilterConfig, extract_pairs,
                        extract_pairs_rowcap_layout_both)
from .utils import Logger, LogLevel
from .visitor import DummyTransformVisitor, visitor_needs_global

_K_SMALL_ERROR = 0.00001      # ref:match4pcsBase.hpp:101
_K_MIN_TRIALS = 4             # ref:hpp:102
_K_DIAMETER_FRACTION = 0.3    # ref:hpp:103


def _enable_compilation_cache():
    """Persist XLA executables across processes (~100 s of compiles per
    cold run otherwise). Respects an existing user setting."""
    import os
    if jax.config.jax_compilation_cache_dir is None:
        default = os.path.join(
            os.path.expanduser("~"), ".cache", "super4pcs_tpu", "xla")
        try:
            os.makedirs(default, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", default)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.2)
        except (OSError, AttributeError):
            pass


@dataclasses.dataclass
class RegistrationResult:
    """Outcome of one registration run."""
    score: float                     # best LCP in [0, 1]
    transform: np.ndarray            # 4x4 mapping Q onto P, original coords
    transformed_q: Optional[PointCloud]  # original Q moved by `transform`
    n_trials: int
    improved: bool
    stats: dict


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def resolve_bases_per_step(opts: Options, nq: int,
                           mesh_size: int = 1) -> int:
    """Effective vmapped-RANSAC width (see Options.bases_per_step).

    ``None`` auto-scales by the sampled-Q size: small-nq steps are
    dispatch-bound (device work ~tens of microseconds vs a multi-ms
    host<->device round-trip on a tunneled TPU), so fusing 64 trials
    per step amortizes the latency; large-nq steps are compute-bound
    and 16 keeps per-step memory in check. Rounded up to a multiple of
    ``mesh_size`` so bases-axis sharding always divides evenly.
    """
    b = opts.bases_per_step
    if b is None:
        b = 16 if nq > 1024 else 64
        if opts.estimate_scale and nq > 2048:
            # the allpairs engine's implicit table is nq^2 rows PER
            # BASE; a narrow step keeps the per-step join sort and its
            # HBM footprint bounded (nq=4096, B=4: ~67M sorted rows)
            b = 4
        if mesh_size > 1:
            b = _round_up(b, mesh_size)
    return b


def resolve_pair_engine(opts: Options, nq: int,
                        have_band_index: bool = True) -> str:
    """Effective pair-extraction engine (see Options.pair_engine):
    dense masking at toy nq, row-capped capture in the middle, the
    banded sorted-table engine at large nq (where Theta(nq^2) mask
    evaluation dominates a step). Callers that cannot carry a
    per-cloud band index (the pairs-axis vmap of parallel/batch.py)
    pass have_band_index=False and get the rowcap fallback."""
    e = opts.pair_engine
    if e == "auto":
        if opts.estimate_scale:
            # scale mode disables the distance band, so EVERY ordered
            # (i, j) is a candidate: any capped capture of the nq^2
            # space loses the true (pair1, pair2) joint (measured fail
            # at nq=2500 with 64*nq rowcap capture). Dense exact
            # capture to 2048; above that the ALLPAIRS implicit table —
            # the join reads the full ordered-pair enumeration in
            # rowcap layout (row t = (t // nq, t % nq)): zero capture
            # loss, zero extraction cost, both hash-stage endpoint
            # columns pure broadcasts (see ops/congruent.py
            # allpairs_cols).
            return "dense" if nq <= 2048 else "allpairs"
        # thresholds measured on TPU v5 lite (tools/band_scale_bench):
        # at nq=32768 rowcap is 1.5x faster per step (5.8 s vs 8.7 s);
        # at nq=65536 rowcap's approx-top-k OOMs HBM (19.5 G > 15.75 G)
        # while banded runs at 16.8 s/step — banded is the only engine
        # past 32k, not the fastest at 32k
        e = ("dense" if nq <= 2048
             else ("rowcap" if nq <= 32768 else "banded"))
    if e == "banded" and not have_band_index:
        e = "rowcap" if nq > 2048 else "dense"
    return e


def _build_try_base(opts: Options, nq: int, cone_tol: float,
                    band_index=None):
    """Build the single-base trial function shared by the production
    step (:func:`build_step`) and the phase probes
    (:func:`build_phase_probes`).

    ``band_index``: a prebuilt ops.band_extract.BandIndex when the
    resolved engine is "banded" (the matcher builds it once per run in
    _init; builders without one fall back per resolve_pair_engine).

    Returns (try_base, (k_pairs, k_quads, n_cands)).
    """
    if opts.bases_per_step is None:
        opts = opts.replace(bases_per_step=resolve_bases_per_step(opts, nq))
    engine = resolve_pair_engine(opts, nq, band_index is not None)
    # Capacity defaults. The reference keeps *all* pairs and scores
    # *every* congruent quad (ref:hpp:390-393); undersized buffers
    # silently drop true candidates, so defaults err generous —
    # pair counts scale ~ nq^2 * shell fraction, quad counts with the
    # invariant-point collision rate (~5-10 * nq at reference operating
    # points, but ~200 * nq at fine-delta scale where eps spans many
    # sample spacings). At large nq the capture ratio directly gates
    # quality (a base only succeeds when BOTH edges' true counterpart
    # pairs survive the cap), so the heuristic widens: 64 * nq measured
    # 3/3 seeds >= 0.97 LCP on the fine-delta 100k config vs flaky
    # 0.78-0.99 at 16 * nq — EXCEPT on the banded engine, whose
    # candidates are already distance-band-filtered before capture:
    # there 16 * nq measured quality parity with 64 * nq at nq=32768
    # (LCP 0.8539 vs 0.8545, seed 5) at ~4x cheaper steps (BASELINE r3).
    # (widened proportionally under coarse search: the distance band —
    # and so the per-row hit count — scales with search_delta_factor)
    if engine == "allpairs":
        if not opts.estimate_scale:
            # without estimate_scale the join applies no pair-distance
            # predicate, so the unfiltered table would admit any-length
            # pairs — the engine is only meaningful in scale mode
            raise ValueError("pair_engine='allpairs' requires "
                             "estimate_scale=True")
        # the implicit table IS the full enumeration: k1 = nq * nq by
        # layout (max_pairs does not apply — there is no capture)
        k_pairs = nq * nq
    elif opts.max_pairs:
        k_pairs = opts.max_pairs
    elif opts.estimate_scale and nq <= 2048:
        # similarity mode disables the distance filter, so EVERY ordered
        # (i, j) is a hit — the band-scaled heuristic below undersizes
        # by ~nq/16x and the capture prefix silently loses most true
        # pairs. Size for the full set (it is the exact count).
        k_pairs = _round_up(nq * (nq - 1), 128)
    else:
        per_nq = 64 if (nq > 2048 and engine != "banded") else 16
        k_pairs = _round_up(
            min(nq * nq,
                max(int(per_nq * nq
                        * max(opts.search_delta_factor, 1.0)), 512)), 128)
    k_quads = _round_up(
        opts.max_quads or min(max(8 * nq, 512), 8192), 128)
    n_cands = min(opts.max_candidates or opts.bases_per_step * k_quads,
                  opts.bases_per_step * k_quads)

    cfg = PairFilterConfig(
        max_normal_difference=opts.max_normal_difference,
        max_color_distance=opts.max_color_distance,
        max_translation_distance=opts.max_translation_distance,
        max_angle=opts.max_angle,
        use_distance_filter=not opts.estimate_scale,
    )
    # Search-stage tolerances widen by search_delta_factor (1.0 = the
    # reference contract); verification/refinement stay exact at delta
    # (see Options.search_delta_factor).
    sf = opts.search_delta_factor
    eps_pairs = DISTANCE_FACTOR * opts.delta * sf  # ref:hpp:328-331
    # Join radius: squared-vs-squared contract — deliberate divergence
    # from the reference's squared-vs-raw quirk (see ops/congruent.py
    # module docstring).
    dist_thr = DISTANCE_FACTOR * opts.delta * sf   # ref:hpp:340-347
    max_angle_rad = (opts.max_angle * math.pi / 180.0
                     if opts.max_angle >= 0 else -1.0)
    rms_gate = DISTANCE_FACTOR * opts.delta * sf   # ref:hpp:439
    # join cell size stays at the exact-delta scale (see the
    # find_congruent_quads_grid call below)
    cell_size = 2.0 * DISTANCE_FACTOR * opts.delta
    n_tri = opts.n_triangle_trials
    b_per_step = opts.bases_per_step
    delta = opts.delta

    # dense (n^2-mask) extraction up to ~2k Q samples; per-row-capped
    # approx-top-k capture beyond that, handed to the join in its raw
    # (row, slot) layout — no global compaction stage and no k_pairs
    # capacity cliff on this path (see extract_pairs_rowcap_layout).
    # max_pairs still tunes the default row_cap so the knob keeps its
    # meaning.
    # Join selection for the small-nq (dense extraction) path: the
    # K1 x K2 dense oracle beats the sorted-hash grid join outright when
    # the mask fits — at hippo scale (k_pairs=3200, B=64) the dense form
    # measured 284 ms/step vs 3221 ms for the grid (whose per-probe
    # gather volume is sized by the pair CAPACITY, mostly sentinel slots
    # at toy scale) — and it is exact: no per-cell cap, no cell_dropped
    # pressure. The element budget bounds the vmapped mask + compaction
    # footprint (k_pairs^2 * B bools + one cumsum).
    dense_join = (not opts.force_grid_join
                  and engine == "dense"
                  and k_pairs * k_pairs * b_per_step <= (1 << 30))
    # scale mode: rotate the dense capture per base (see extract_pairs
    # row_offset) — with the distance filter off, overflow capture bias
    # is systematic, not incidental
    rotate_dense = opts.estimate_scale

    if engine == "dense":
        join_row_cap = None

        def _extract_both(pos, normal, rgb, bpos, bnorm, brgb, eps,
                          pcfg, col_offset=None):
            ro = col_offset if rotate_dense else None
            return (extract_pairs(pos, normal, rgb, bpos, bnorm, brgb,
                                  0, 1, eps, pcfg, capacity=k_pairs,
                                  row_offset=ro),
                    extract_pairs(pos, normal, rgb, bpos, bnorm, brgb,
                                  2, 3, eps, pcfg, capacity=k_pairs,
                                  row_offset=ro))
    elif engine == "allpairs":
        join_row_cap = nq

        def _extract_both(pos, normal, rgb, bpos, bnorm, brgb, eps,
                          pcfg, col_offset=None):
            # nothing to extract: the join derives pair (row, col) from
            # the slot index (allpairs_cols). count is the exact hit
            # count — every ordered off-diagonal pair (the scale-
            # consistency gate rejects the diagonal's zero-length rows)
            valid = jnp.ones((nq * nq,), bool)
            cnt = jnp.int32(nq * (nq - 1))
            z = jnp.int32(0)
            return (None, valid, cnt, z), (None, valid, cnt, z)
    elif engine == "banded":
        join_row_cap = None
        pc = band_index.pc
        # two-level capture sizing: per-entry slot budget ~2x the mean
        # occupancy product (known at index build) bounds padding waste
        # at ~2x while keeping per-entry loss small, and the window
        # size = expansion budget / that target spreads the budget over
        # as much of the band as it can actually expand — an oversized
        # window starves every entry, an undersized one reintroduces
        # the thin-slice capture bias that collapsed quality at
        # nq=32768 (LCP 0.028 vs rowcap's 0.849; see
        # ops/band_extract.py module docstring).
        expand_cap = opts.band_expand_cap or _round_up(4 * k_pairs, 128)
        mean_occ = max(
            1.0, min(band_index.n / max(band_index.m, 1), float(pc)))
        es_target = max(4, int(2.0 * mean_occ * mean_occ))
        cell_pair_cap = opts.band_cell_pair_cap or _round_up(
            min(max(expand_cap // es_target, 8192), 262144), 128)
        expand_cap = min(expand_cap, cell_pair_cap * pc * pc)
        _extract_both = functools.partial(
            extract_pairs_banded_both, band_index,
            cell_pair_cap=cell_pair_cap, capacity=k_pairs,
            expand_cap=expand_cap)
    else:
        join_row_cap = opts.pair_row_cap or min(nq, max(32, _round_up(
            5 * k_pairs // (2 * nq), 32)))
        # fused two-edge scan: shared block geometry, one approx_max_k
        _extract_both = functools.partial(
            extract_pairs_rowcap_layout_both, row_cap=join_row_cap,
            recall_target=opts.pair_recall_target)

    def try_base(key, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb):
        ids, inv1, inv2, bvalid = select.select_base(
            key, p_pos, diam, n_tri)
        base_pos = p_pos[ids]
        base_norm = p_norm[ids]
        base_rgb = p_rgb[ids]

        # per-base column rotation decorrelates the row-cap capture
        # lottery across trials (see extract_pairs_rowcap)
        off = jax.random.randint(jax.random.fold_in(key, 7919), (),
                                 0, q_pos.shape[0])
        (pairs1, v1, c1, d1), (pairs2, v2, c2, d2) = _extract_both(
            q_pos, q_norm, q_rgb, base_pos, base_norm, base_rgb,
            eps_pairs, cfg, col_offset=off)

        # angle between the two base segments (ref:super4pcs.cc:109-111)
        s1 = base_pos[1] - base_pos[0]
        s2 = base_pos[3] - base_pos[2]
        n_s1 = jnp.maximum(jnp.linalg.norm(s1), 1e-30)
        n_s2 = jnp.maximum(jnp.linalg.norm(s2), 1e-30)
        cos_alpha = jnp.dot(s1 / n_s1, s2 / n_s2)
        # similarity mode: the join applies the reference's MULTISCALE
        # ratioDev gate (ref:match4pcsBase.cc:390-414) as an exact mask
        # BEFORE the quad-capacity compaction (see find_congruent_quads)
        if opts.estimate_scale:
            seg_ratio = n_s1 / n_s2
            scale_band = geometry.SCALE_RATIO_DEV
            # per-trial rotation of the strided Q-side probe sample
            # (see find_congruent_quads_grid q_uniform)
            qrot = jax.random.randint(
                jax.random.fold_in(key, 104729), (), 0, k_pairs)
        else:
            seg_ratio = None
            scale_band = -1.0
            qrot = None

        if dense_join:
            quads, qvalid, qcount = congruent.find_congruent_quads(
                q_pos, pairs1, v1, pairs2, v2, inv1, inv2,
                dist_thr, cos_alpha, cone_tol, k_quads,
                direction_bins=opts.direction_bins,
                healpix_nside=opts.healpix_nside,
                seg_ratio=seg_ratio, scale_band=scale_band)
            qdropped = jnp.int32(0)
        else:
            quads, qvalid, qcount, qdropped = \
                congruent.find_congruent_quads_grid(
                    q_pos, pairs1, v1, pairs2, v2, inv1, inv2,
                    dist_thr, cos_alpha, cone_tol, k_quads,
                    seg_ratio=seg_ratio, scale_band=scale_band,
                    cell_candidates=opts.cell_candidates,
                    q_budget=opts.join_q_budget,
                    direction_bins=opts.direction_bins,
                    healpix_nside=opts.healpix_nside,
                    # cell size stays at the exact-delta scale so
                    # per-cell occupancy (and the cell_candidates cap
                    # pressure) does not grow with search_delta_factor —
                    # the coarse radius probes a wider window of fine
                    # cells instead
                    cell_size=cell_size,
                    row_cap=join_row_cap,
                    allpairs_cols=(engine == "allpairs"),
                    # strided Q-side sampling only where the valid
                    # prefix is structurally biased (the raw allpairs
                    # enumeration); dense-captured buffers keep the
                    # prefix rule — their rotated capture already
                    # decorrelates, and it is the validated behavior
                    q_uniform=(engine == "allpairs"),
                    q_rot=qrot,
                    # probe compaction: the gather/validate volume
                    # follows cells actually hit instead of probes
                    # issued. On the rowcap path qb defaults to the
                    # join_q_budget; on the mid-size dense-extraction
                    # path it is capped by the pair capacity (measured
                    # 3.1x step cut at hippo scale before the dense
                    # oracle superseded it there). Budget scales with
                    # the probe-window volume (w^3 probes per query).
                    probe_budget=(
                        opts.join_probe_budget
                        or (2 * min(opts.join_q_budget or 8192,
                                    k_pairs if join_row_cap is None
                                    else (opts.join_q_budget or 8192))
                            * congruent.probe_window(
                                dist_thr, cell_size) ** 3) // 8))
        qvalid = qvalid & bvalid

        cand = q_pos[quads]                         # (Kq, 4, 3)
        centroid1 = base_pos[:3].mean(axis=0)       # ref:hpp:385
        centroid2 = cand[:, :3].mean(axis=1)        # ref:hpp:415-417
        transform, rms, tvalid = geometry.batched_rigid_fit(
            base_pos, cand, centroid1, centroid2, max_angle_rad,
            estimate_scale=opts.estimate_scale)
        cvalid = qvalid & tvalid & (rms >= 0) & (rms < rms_gate)

        # telemetry row: exact pre-cap pair counts, exact pre-cap quad
        # count, per-cell join drops, and pairs actually dropped from
        # the buffers (incl. blocked-extraction per-block cap drops)
        return dict(transform=transform, cvalid=cvalid,
                    centroid1=centroid1, centroid2=centroid2,
                    ids=ids, quads=quads,
                    counts=jnp.stack([c1, c2, qcount, qdropped, d1 + d2]),
                    # intermediates for the phase probes (unused outputs
                    # are dead-code-eliminated from the production step;
                    # the allpairs engine has no pair arrays — its
                    # extraction phase is empty by construction)
                    _pairs_sum=(jnp.int32(0) if pairs1 is None else
                                jnp.sum(pairs1 * v1[:, None])
                                + jnp.sum(pairs2 * v2[:, None])),
                    _quads_sum=jnp.sum(quads * qvalid[:, None]))

    return try_base, (k_pairs, k_quads, n_cands)


def build_step(opts: Options, nq: int, cone_tol: float, band_index=None):
    """Build the jittable RANSAC device step.

    A module-level builder so the same program serves three execution
    shapes: single-device jit, bases-axis shard_map (parallel/sharded),
    and pairs-axis vmap for batched scan-graph registration
    (parallel/batch). The step signature is

        step(keys (B,), diam (), p_pos, p_norm, p_rgb,
             q_pos, q_norm, q_rgb) -> dict

    ``diam`` (the max base diameter, ref:hpp:172) is a traced argument
    rather than a closure constant so a pairs-axis vmap can carry one
    per registration pair.

    Returns (step, (k_pairs, k_quads, n_cands)).
    """
    if opts.bases_per_step is None:
        opts = opts.replace(bases_per_step=resolve_bases_per_step(opts, nq))
    try_base, caps = _build_try_base(opts, nq, cone_tol, band_index)
    k_pairs, k_quads, n_cands = caps
    b_per_step = opts.bases_per_step
    delta = opts.delta
    # Coarse-search candidate ranking: with search_delta_factor > 1 the
    # 4-point fits are only located to sf * delta, so their EXACT-delta
    # LCP is depressed and a true-basin candidate can lose the step
    # argmax to a stable false one. Rank candidates at the search
    # tolerance (where a true basin's inlier fraction approaches the
    # overlap) and report the selected candidate's exact-delta score
    # separately — adoption/termination stay on the exact metric, the
    # guarded refine decides whether a rank-winner becomes the best.
    rank_delta = delta * opts.search_delta_factor

    def step(keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb):
        """One device step over ``keys.shape[0]`` bases. Written to be
        shardable: under shard_map each device receives a slice of the
        keys axis and runs this same program on its shard."""
        tb = jax.vmap(lambda k: try_base(
            k, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb))(keys)

        flat_t = tb["transform"].reshape(-1, 4, 4)
        flat_v = tb["cvalid"].reshape(-1)

        # compact the valid candidates across the whole step before
        # the (expensive) LCP scoring — replaces the reference's
        # per-candidate early exits with one dense batch. Capacity
        # scales with the local (per-shard) base count. When the cap
        # covers every slot the compaction would be an identity-size
        # shuffle — skip it and mask instead.
        b_local = keys.shape[0]
        n_cands_local = max(128, (n_cands * b_local) // b_per_step)
        if n_cands_local >= flat_v.shape[0]:
            idx = jnp.arange(flat_v.shape[0], dtype=jnp.int32)
            live = flat_v
            n_valid = jnp.sum(flat_v, dtype=jnp.int32)
            cand_t = flat_t
            cands_dropped = jnp.int32(0)
        else:
            idx, live, n_valid = masked_indices(flat_v, n_cands_local)
            cand_t = flat_t[idx]
            # candidates beyond the compaction cap never reach LCP
            # scoring: count them (items, not steps)
            cands_dropped = jnp.maximum(n_valid - n_cands_local, 0)
        if opts.verify_top_k > 0:
            scores, sel = lcp.lcp_scores_two_stage(
                cand_t, q_pos, p_pos, rank_delta,
                coarse_q=opts.coarse_q, coarse_p=opts.coarse_p,
                top_k=opts.verify_top_k, live=live)
            live = live[sel]
            cand_t = cand_t[sel]
            idx = idx[sel]
        else:
            scores = lcp.lcp_scores(cand_t, q_pos, p_pos, rank_delta)
        scores = jnp.where(live, scores, -1.0)

        best = jnp.argmax(scores)
        if rank_delta != delta:
            exact = lcp.lcp_score_single(
                cand_t[best], q_pos, p_pos, jnp.float32(delta))
            exact = jnp.where(scores[best] >= 0, exact, -1.0)
        else:
            exact = scores[best]
        flat_i = idx[best]
        b = flat_i // k_quads
        qi = flat_i % k_quads
        return dict(
            lcp=exact,
            rank_lcp=scores[best],
            transform=cand_t[best],
            qcentroid1=tb["centroid1"][b],
            qcentroid2=tb["centroid2"][b, qi],
            base_ids=tb["ids"][b],
            congruent_ids=tb["quads"][b, qi],
            n_congruent=n_valid,
            cands_dropped=cands_dropped,
            pair_counts=tb["counts"],
        )

    return step, (k_pairs, k_quads, n_cands)


def build_phase_probes(opts: Options, nq: int, cone_tol: float,
                       band_index=None):
    """Telescoped sub-programs of the device step for phase timing.

    The production step fuses select/extract/join/fit/verify into one
    XLA program, so per-phase cost is recovered by timing programs that
    return only a prefix's outputs — XLA dead-code-eliminates the
    suffix. The checksums returned exist purely to keep each prefix's
    compute live. The TPU analog of the reference's per-phase timers
    (ref:match4pcsBase.hpp:77-83 totalTime/verifyTime/kdTreeTime).

    Returns {"extract": fn, "join": fn, "fit": fn} with the step
    signature.
    """
    try_base, _ = _build_try_base(opts, nq, cone_tol, band_index)

    def _vmapped(keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb):
        return jax.vmap(lambda k: try_base(
            k, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb))(keys)

    def probe_extract(*args):
        tb = _vmapped(*args)
        return tb["_pairs_sum"].sum() + tb["counts"][:, :2].sum()

    def probe_join(*args):
        tb = _vmapped(*args)
        return (tb["_pairs_sum"].sum() + tb["_quads_sum"].sum()
                + tb["counts"].sum())

    def probe_fit(*args):
        tb = _vmapped(*args)
        return (tb["_quads_sum"].sum() + tb["counts"].sum()
                + tb["transform"].sum() + tb["cvalid"].sum())

    return {"extract": probe_extract, "join": probe_join,
            "fit": probe_fit}


class Match4PCSBase:
    """Shared driver. Subclasses fix the congruent-join mode."""

    #: cosine cone tolerance; subclass sets (<0 disables = 4PCS mode)
    _cone_mode = -1.0

    def __init__(self, options: Options, logger: Optional[Logger] = None,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh with a 'bases' axis; when
        given, each device step shards its bases across the mesh (see
        parallel/sharded.py). bases_per_step must divide evenly."""
        self.options = options
        self.logger = logger or Logger(LogLevel.NoLog)
        self._step_fn = None
        self._mesh = mesh
        if (mesh is not None and options.bases_per_step is not None
                and options.bases_per_step % mesh.size != 0):
            raise ValueError(
                f"bases_per_step ({options.bases_per_step}) must be "
                f"divisible by the mesh size ({mesh.size})")
        # resolved at _init once the sampled-Q size is known
        self._b_eff = options.bases_per_step

    def _step_keys(self, step_idx: int):
        """Per-base keys for one device step, placed shard-per-device
        over the mesh 'bases' axis when a mesh is configured."""
        keys = jax.random.split(
            jax.random.fold_in(self._key, step_idx), self._b_eff)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            keys = jax.device_put(
                keys, NamedSharding(self._mesh, PartitionSpec("bases")))
        return keys

    # ------------------------------------------------------------------
    # public API (mirrors ComputeTransformation, ref:hpp:61-86)
    # ------------------------------------------------------------------

    def compute_transformation(
        self, P: PointCloud, Q: PointCloud,
        visitor=None, resume_state: Optional[dict] = None,
    ) -> RegistrationResult:
        """Run (or resume) the registration.

        ``resume_state``: a dict previously returned by
        :meth:`export_state` — the search continues from its trial
        counter and best-so-far, the TPU-native form of the reference's
        ``current_trial_`` resume design (ref:match4pcsBase.hpp:236-258,
        h:131-161). Enables preemptible-TPU checkpoint/resume.
        """
        visitor = visitor or DummyTransformVisitor()
        if len(P) == 0 or len(Q) == 0:
            # degenerate inputs return kLargeNumber, not an exception
            # (ref:hpp:69-70)
            return RegistrationResult(
                score=K_LARGE_NUMBER, transform=np.eye(4, dtype=np.float32),
                transformed_q=None, n_trials=0, improved=False, stats={})

        self._init(P, Q)
        if resume_state is not None:
            self._import_state(resume_state)
        if self._best_lcp != 1.0:
            self._perform_steps(visitor)
        if self._refine_active() and self._best_lcp < 1.0:
            tr0 = time.perf_counter()
            self._maybe_refine()
            self._stats["refine_seconds"] = time.perf_counter() - tr0

        improved = self._best_lcp > self._initial_lcp
        if improved:
            global_mat = self._global_transform()
            transformed_q = self._q_original.transformed(global_mat)
            out_mat = global_mat
        else:
            transformed_q = self._q_original
            out_mat = np.eye(4, dtype=np.float32)

        return RegistrationResult(
            score=float(self._best_lcp),
            transform=np.asarray(out_mat, dtype=np.float32),
            transformed_q=transformed_q,
            n_trials=self._trial,
            improved=improved,
            stats=dict(self._stats),
        )

    # accessors mirroring getFirstSampled/getSecondSampled
    # (ref:match4pcsBase.h:88-94) — in original (uncentered) coordinates.
    def get_first_sampled(self) -> PointCloud:
        return self._sampled_p_world

    def get_second_sampled(self) -> PointCloud:
        return self._sampled_q_world

    # ------------------------------------------------------------------
    # init (mirrors ref:hpp:90-203)
    # ------------------------------------------------------------------

    def _init(self, P: PointCloud, Q: PointCloud):
        _enable_compilation_cache()
        opts = self.options
        rng = np.random.default_rng(opts.random_seed)
        self._q_original = Q
        # re-resolve per run: a reused matcher may see a different nq
        self._b_eff = opts.bases_per_step

        if len(P) <= opts.sample_size:
            self.logger.error(
                "(P) More samples requested than available: use whole cloud")
        sampled_p = sampling.sample_for_matching(
            P, opts.delta, opts.sample_size, truncate=False, rng=rng)
        if opts.p_sample_budget:
            # pin the P shape: one compiled step program serves any
            # cloud size (see Options.p_sample_budget)
            n_p = len(sampled_p)
            if n_p > opts.p_sample_budget:
                keep = rng.permutation(n_p)[:opts.p_sample_budget]
            else:
                keep = np.resize(np.arange(n_p), opts.p_sample_budget)
            sampled_p = sampled_p.take(keep)
        if len(Q) <= opts.sample_size:
            self.logger.error(
                "(Q) More samples requested than available: use whole cloud")
        q_target = opts.sample_size
        self._scale_q_capped = 0
        if opts.estimate_scale and q_target > opts.scale_max_q:
            # scale mode disables the distance filter; beyond this
            # ceiling the capped capture of the nq^2 pair space loses
            # the true (pair1, pair2) joint (see Options.scale_max_q)
            self._scale_q_capped = q_target - opts.scale_max_q
            q_target = opts.scale_max_q
            self.logger.error(
                "estimate_scale: Q sample capped to ", q_target,
                " (scale_max_q; see Options)")
        sampled_q = sampling.sample_for_matching(
            Q, opts.delta, q_target, truncate=True, rng=rng)
        self._sampled_p_world = sampled_p
        self._sampled_q_world = sampled_q

        # center on centroids (ref:hpp:141-149)
        self._centroid_p = sampled_p.pos.mean(axis=0)
        self._centroid_q = sampled_q.pos.mean(axis=0)
        p_pos = sampled_p.pos - self._centroid_p
        q_pos = sampled_q.pos - self._centroid_q

        # randomized diameter — the reference draws the probe pairs from
        # the *Q* samples (ref:hpp:156-163), kept as-is for parity.
        self._p_diameter = geometry.estimate_diameter(
            q_pos, K_NUMBER_OF_DIAMETER_TRIALS, rng)
        self._max_base_diameter = self._p_diameter  # ref:hpp:172

        # trial-count estimate (ref:hpp:175-185)
        overlap = opts.overlap_estimation
        denom = math.log(max(1.0 - overlap ** _K_MIN_TRIALS, 1e-300))
        first_estimation = (math.log(_K_SMALL_ERROR) / denom
                            if denom != 0.0 else 0.0)
        if self._max_base_diameter > 0:
            n_trials = int(first_estimation
                           * (self._p_diameter / _K_DIAMETER_FRACTION)
                           / self._max_base_diameter)
        else:
            n_trials = 0
        self.number_of_trials = max(n_trials, _K_MIN_TRIALS)
        #: trial-budget multiplier — +1 per escalation (the budget is
        #: number_of_trials * this, so post-init overrides of
        #: number_of_trials — e.g. in tests — stay effective)
        self._budget_mult = 1
        #: live search factor (escalation raises it mid-run)
        self._search_sf = opts.search_delta_factor

        self.logger.verbose("norm_max_dist: ", opts.delta)

        # banded pair engine: the once-per-run sorted cell-pair table
        # over the (centered) Q samples (see ops/band_extract.py and
        # Options.pair_engine)
        nq_samples = len(sampled_q)
        if resolve_pair_engine(opts, nq_samples) == "banded":
            self._band_index = build_band_index(
                q_pos, opts.delta, cell_budget=opts.band_cell_budget)
            self._stats_band = {
                "band_cells": self._band_index.m,
                "band_cell_size": self._band_index.g,
                "band_member_dropped": self._band_index.member_dropped,
            }
        else:
            self._band_index = None
            self._stats_band = {}

        # device-resident arrays
        f32 = jnp.float32
        self._d_p_pos = jnp.asarray(p_pos, f32)
        self._d_p_norm = jnp.asarray(sampled_p.normals_or_zero(), f32)
        self._d_p_rgb = jnp.asarray(sampled_p.rgb_or_invalid(), f32)
        self._d_q_pos = jnp.asarray(q_pos, f32)
        self._d_q_norm = jnp.asarray(sampled_q.normals_or_zero(), f32)
        self._d_q_rgb = jnp.asarray(sampled_q.rgb_or_invalid(), f32)

        self._trial = 0
        self._refine_jit = None
        # *_overflow / *_dropped are exact dropped-ITEM counts across
        # the run (pairs, quads, candidates lost to static buffer caps)
        self._stats = {
            "pairs_overflow": 0, "quads_overflow": 0,
            "cands_overflow": 0, "n_congruent": 0, "cell_dropped": 0,
            **self._stats_band,
        }
        if self._scale_q_capped:
            self._stats["scale_q_capped"] = self._scale_q_capped

        # best-so-far state (ref:match4pcsBase.h:131-161)
        self._best_rank = -np.inf       # coarse-search rank metric
        self._transform = np.eye(4, dtype=np.float32)
        self._qcentroid1 = np.zeros(3, dtype=np.float32)
        self._qcentroid2 = np.zeros(3, dtype=np.float32)
        self._base_ids = np.zeros(4, dtype=np.int32)
        self._congruent_ids = np.zeros(4, dtype=np.int32)

        self._build_step()

        # initial verification of the identity transform (ref:hpp:201).
        # Jitted so the (pallas) LCP program lands in the persistent
        # compilation cache instead of recompiling eagerly every run.
        from .utils.profiling import timed_phase
        from .utils.timer import PhaseTimers
        host_timers = PhaseTimers()
        with timed_phase(host_timers, "initial_verify"):
            self._best_lcp = float(jax.jit(lcp.lcp_score_single)(
                jnp.eye(4, dtype=f32), self._d_q_pos, self._d_p_pos,
                jnp.float32(opts.delta)))
        self._stats["initial_verify_seconds"] = \
            host_timers.phases["initial_verify"]
        self._initial_lcp = self._best_lcp
        self.logger.verbose("Initial LCP: ", self._best_lcp)

        self._key = jax.random.key(opts.random_seed)

    # ------------------------------------------------------------------
    # jitted device step: B complete RANSAC trials + batched verify
    # ------------------------------------------------------------------

    @property
    def _trial_budget(self) -> int:
        return self.number_of_trials * self._budget_mult

    def _opts_eff(self) -> Options:
        """Options with the LIVE search factor (see _escalate) and the
        resolved bases_per_step."""
        if (self._search_sf == self.options.search_delta_factor
                and self._b_eff == self.options.bases_per_step):
            return self.options
        return self.options.replace(search_delta_factor=self._search_sf,
                                    bases_per_step=self._b_eff)

    def _build_step(self):
        nq = int(self._d_q_pos.shape[0])
        if self._b_eff is None:
            self._b_eff = resolve_bases_per_step(
                self.options, nq,
                self._mesh.size if self._mesh is not None else 1)
        opts = self._opts_eff()
        step, caps = build_step(opts, nq, self._cone_mode,
                                band_index=self._band_index)
        self._step_raw = step
        if self._mesh is not None:
            from .parallel import sharded_step
            self._step_fn = sharded_step(
                step, self._mesh,
                gather_telemetry=opts.sharded_gather_telemetry)
        else:
            self._step_fn = jax.jit(step)
        self._k_pairs, self._k_quads, self._n_cands = caps

    # ------------------------------------------------------------------
    # host anytime loop (mirrors Perform_N_steps, ref:hpp:208-274)
    # ------------------------------------------------------------------

    def _perform_steps(self, visitor):
        opts = self.options
        needs_global = visitor_needs_global(visitor)
        b = self._b_eff

        visitor(0.0, self._best_lcp,
                self._visitor_transform(needs_global))

        # Compile before starting the anytime clock: the reference's
        # max_time budget (ref:hpp:239-244) measures search time; XLA
        # compilation is a one-time cost amortized by the jit cache.
        diam = jnp.float32(self._max_base_diameter)
        args = (self._step_keys(0), diam,
                self._d_p_pos, self._d_p_norm, self._d_p_rgb,
                self._d_q_pos, self._d_q_norm, self._d_q_rgb)
        tc = time.perf_counter()
        self._step_fn = self._step_fn.lower(*args).compile()
        if self._refine_active():
            # the in-loop refinement below must dispatch warm — its
            # compile belongs with the step's, off the anytime clock.
            # Rebind to the compiled executable: lower().compile() does
            # not populate the jit wrapper's own cache.
            self._refine_jit = self._refine_fn().lower(
                jnp.eye(4, dtype=jnp.float32), self._d_q_pos,
                self._d_p_pos).compile()
        self._stats["compile_seconds"] = time.perf_counter() - tc

        if opts.phase_timing:
            self._measure_phases(args)

        t0 = time.perf_counter()
        step_idx = self._trial // b   # continue the PRNG stream on resume

        # Speculative pipelining: keep two steps in flight so device
        # compute overlaps the (tunnel round-trip) result fetch and the
        # next key dispatch. The anytime contract tolerates the one
        # extra in-flight step abandoned at stop — RANSAC trials are
        # independent.
        def launch(i):
            return self._step_fn(
                self._step_keys(i), diam,
                self._d_p_pos, self._d_p_norm, self._d_p_rgb,
                self._d_q_pos, self._d_q_norm, self._d_q_rgb)

        inflight = [launch(step_idx)]
        while True:
            inflight.append(launch(step_idx + 1))
            # one device->host transfer per step: each fetch is a full
            # round-trip on a remote/tunneled device
            out = jax.device_get(inflight.pop(0))
            step_lcp = float(out["lcp"])
            self._trial += b
            step_idx += 1

            self._stats["n_congruent"] += int(out["n_congruent"])
            counts = np.asarray(out["pair_counts"])
            # overflow counters are DROPPED-ITEM counts (pairs / quads /
            # candidates lost to static buffer caps), not step counts —
            # "never silently truncate without counting" means knowing
            # how much was truncated
            self._stats["pairs_overflow"] += int(counts[:, 4].sum())
            self._stats["quads_overflow"] += int(
                np.maximum(counts[:, 2] - self._k_quads, 0).sum())
            self._stats["cell_dropped"] += int(counts[:, 3].sum())
            self._stats["cands_overflow"] += int(out["cands_dropped"])

            step_rank = float(out.get("rank_lcp", step_lcp))
            if step_lcp > self._best_lcp:
                self._best_lcp = step_lcp
                self._transform = np.asarray(out["transform"])
                self._qcentroid1 = np.asarray(out["qcentroid1"])
                self._qcentroid2 = np.asarray(out["qcentroid2"])
                self._base_ids = np.asarray(out["base_ids"])
                self._congruent_ids = np.asarray(out["congruent_ids"])
                # improvement callback (ref:hpp:458-465, fraction = -1)
                visitor(-1.0, self._best_lcp,
                        self._visitor_transform(needs_global))
                # In-loop refinement: RANSAC's 4-point fit routinely
                # lands at 60-90% of the achievable LCP under noise;
                # polishing each new best (guarded, one warm dispatch)
                # lets the terminate_threshold stop rule fire steps
                # earlier instead of grinding out the full trial
                # estimate and only then refining. Counts toward the
                # anytime budget, like any other search work.
                if self._refine_active() and self._best_lcp < 1.0:
                    before = self._best_lcp
                    self._maybe_refine()
                    if self._best_lcp > before:
                        visitor(-1.0, self._best_lcp,
                                self._visitor_transform(needs_global))
            elif (step_rank > self._best_rank and step_rank >= 0
                  and self._search_sf != 1.0
                  and self._refine_active() and self._best_lcp < 1.0):
                # Coarse-search mode: the step winner was selected on
                # the rank metric (sf * delta) and its exact score did
                # not beat the best — but a rank improvement usually
                # means a better-located basin whose 4-point fit is
                # merely sloppy. Attempt the guarded refine on it; it
                # is adopted only if its refined exact-delta LCP wins.
                before = self._best_lcp
                self._refine_candidate(out)
                if self._best_lcp > before:
                    visitor(-1.0, self._best_lcp,
                            self._visitor_transform(needs_global))
            self._best_rank = max(self._best_rank, step_rank)

            fraction_try = self._trial / self._trial_budget
            fraction_time = ((time.perf_counter() - t0)
                             / opts.max_time_seconds)
            fraction = (fraction_time if opts.use_full_time_budget
                        else max(fraction_time, fraction_try))
            visitor(min(fraction, 1.0), self._best_lcp,
                    self._visitor_transform(needs_global))

            # stop rules (ref:hpp:255); use_full_time_budget drops the
            # trial-estimate stop (see Options)
            if (self._best_lcp > opts.terminate_threshold
                    or fraction_time >= 0.99
                    or self._best_lcp == 1.0):
                break
            if fraction_try >= 0.99 or self._trial > self._trial_budget:
                # trial estimate exhausted below the threshold: escalate
                # the search factor when configured and the remaining
                # wall budget can amortize the rebuilt program's compile
                # (see Options.search_escalation_factor), else stop as
                # the reference would.
                remaining = opts.max_time_seconds * (1.0 - fraction_time)
                if (opts.search_escalation_factor > self._search_sf
                        and self._refine_active()
                        and remaining > max(0.25 * opts.max_time_seconds,
                                            15.0)):
                    self._escalate(diam)
                    # relaunch with the rebuilt program; the discarded
                    # in-flight step's keys are re-explored at the
                    # wider tolerance
                    inflight = [launch(step_idx)]
                    continue
                if not opts.use_full_time_budget:
                    break

        # search time excluding the one-time compile (the reference's
        # totalTime analog, ref:match4pcsBase.hpp:77-83)
        self._stats["search_seconds"] = time.perf_counter() - t0

    def _escalate(self, diam):
        """Mid-run escalation to the coarse search factor (see
        Options.search_escalation_factor): rebuild + compile the step
        and refine programs at the new factor and extend the trial
        budget by another estimate. Runs inside the anytime clock —
        time-to-solution stays honest."""
        esc = self.options.search_escalation_factor
        self.logger.verbose("Trial estimate exhausted at LCP ",
                            self._best_lcp,
                            "; escalating search_delta_factor to ", esc)
        tc = time.perf_counter()
        self._search_sf = esc
        self._refine_jit = None
        self._build_step()
        args = (self._step_keys(0), diam,
                self._d_p_pos, self._d_p_norm, self._d_p_rgb,
                self._d_q_pos, self._d_q_norm, self._d_q_rgb)
        self._step_fn = self._step_fn.lower(*args).compile()
        if self._refine_active():
            self._refine_jit = self._refine_fn().lower(
                jnp.eye(4, dtype=jnp.float32), self._d_q_pos,
                self._d_p_pos).compile()
        self._budget_mult += 1
        self._stats["escalation_compile_seconds"] = (
            time.perf_counter() - tc)
        self._stats["escalated_to"] = esc

    # ------------------------------------------------------------------

    def _measure_phases(self, args, repeats: int = 3):
        """Per-phase device-step breakdown via telescoped sub-programs
        (see :func:`build_phase_probes`); stored in
        stats["phase_seconds"] and logged as the reference-style timing
        table. Min-of-N wall clock: the tunneled-TPU RPC jitter makes
        single measurements untrustworthy."""
        from .utils.timer import PhaseTimers

        nq = int(self._d_q_pos.shape[0])
        probes = build_phase_probes(self._opts_eff(), nq, self._cone_mode,
                                    band_index=self._band_index)

        def best_of(fn):
            # fresh keys per repetition + a scalar fetch: the tunneled
            # backend can serve an identical remote execution from a
            # cache (measured: a 5.8 s step "repeating" in 0.2 ms), and
            # only a result pull is guaranteed to span completion
            def run(i):
                a = (self._step_keys(1 << 20 | i),) + args[1:]
                return float(jnp.sum(jax.tree.leaves(fn(*a))[0]))

            run(0)                                 # compile + warm
            best = math.inf
            for r in range(1, repeats + 1):
                t0 = time.perf_counter()
                run(r)
                best = min(best, time.perf_counter() - t0)
            return best

        t_extract = best_of(jax.jit(probes["extract"]))
        t_join = best_of(jax.jit(probes["join"]))
        t_fit = best_of(jax.jit(probes["fit"]))
        t_full = best_of(self._step_fn)
        timers = PhaseTimers()
        timers.add("select_extract", t_extract)
        timers.add("join", max(t_join - t_extract, 0.0))
        timers.add("fit", max(t_fit - t_join, 0.0))
        timers.add("verify", max(t_full - t_fit, 0.0))
        timers.add("step_total", t_full)
        self._stats["phase_seconds"] = dict(timers.phases)
        self.logger.verbose(timers.table())

    def _refine_fn(self):
        """One jitted program: trimmed-ICP refine + exact LCP of both
        the current and refined transforms. Built once per run so the
        in-loop refinement (see :meth:`_perform_steps`) costs one warm
        dispatch, and pre-compiled with the step so its compile stays
        off the anytime clock."""
        if self._refine_jit is None:
            opts = self.options
            iters = opts.refine_iterations
            delta = opts.delta

            sf = self._search_sf

            def rf(cur, q_pos, p_pos):
                # trim radius opens at the search tolerance (coarse-
                # search candidates are only located to sf * delta)
                refined = refine.refine_transform(
                    cur, q_pos, p_pos, delta, iters=iters,
                    start_factor=sf,
                    estimate_scale=opts.estimate_scale)
                scores = lcp.lcp_scores(
                    jnp.stack([cur, refined]), q_pos, p_pos, delta)
                return refined, scores

            self._refine_jit = jax.jit(rf)
        return self._refine_jit

    def _refine_active(self) -> bool:
        # similarity (estimate_scale) mode uses the Umeyama fit inside
        # the trimmed ICP, so refinement applies in both modes
        return self.options.refine_iterations > 0

    def _refine_candidate(self, out):
        """Guarded refine of a step's selected candidate that did NOT
        beat the exact best (coarse-search rank-improvement path, see
        :meth:`_perform_steps`). Adopts the refined pose — with this
        step's base/congruent bookkeeping — only if its exact-delta LCP
        wins."""
        cur = jnp.asarray(np.asarray(out["transform"]), jnp.float32)
        refined, scores = self._refine_fn()(
            cur, self._d_q_pos, self._d_p_pos)
        scores = np.asarray(scores)
        self._stats["refined_lcp"] = float(scores[1])
        if scores[1] > self._best_lcp:
            self._best_lcp = float(scores[1])
            refined = np.asarray(refined)
            # refined translation is complete in the centered frames
            # (see _maybe_refine / _global_transform)
            self._transform = refined
            self._qcentroid1 = refined[:3, 3].copy()
            self._qcentroid2 = np.zeros(3, np.float32)
            self._base_ids = np.asarray(out["base_ids"])
            self._congruent_ids = np.asarray(out["congruent_ids"])

    def _maybe_refine(self):
        """Trimmed-ICP polish of the best transform (ops/refine.py);
        kept only when the exact LCP does not decrease.

        ``self._transform`` already maps centered-Q -> centered-P (the
        rigid fit's translation equals qcentroid1 - R @ qcentroid2), so
        refinement runs directly in the centered frames the device
        arrays live in."""
        cur = jnp.asarray(self._transform, jnp.float32)
        refined, scores = self._refine_fn()(
            cur, self._d_q_pos, self._d_p_pos)
        scores = np.asarray(scores)
        self._stats["refined_lcp"] = float(scores[1])
        if scores[1] > self._best_lcp:
            self._best_lcp = float(scores[1])
            refined = np.asarray(refined)
            # _global_transform rebuilds the translation from the
            # qcentroids; encode the refined translation there
            self._transform = refined
            self._qcentroid1 = refined[:3, 3].copy()
            self._qcentroid2 = np.zeros(3, np.float32)

    def _global_transform(self) -> np.ndarray:
        """Recompose the centered-frame best transform into original
        coordinates (ref:hpp:224-229)."""
        out = np.array(self._transform, dtype=np.float32)
        rot = out[:3, :3]
        out[:3, 3] = (self._qcentroid1 + self._centroid_p
                      - rot @ (self._qcentroid2 + self._centroid_q))
        return out

    def _visitor_transform(self, needs_global: bool) -> np.ndarray:
        return (self._global_transform() if needs_global
                else np.array(self._transform))

    def export_state(self) -> dict:
        """Serializable RANSAC state (checkpoint/resume; the analog of
        ref:match4pcsBase.h:131-161 + hpp:236/258 resume design)."""
        return {
            "trial": self._trial,
            "best_lcp": self._best_lcp,
            "best_rank": self._best_rank,
            "search_sf": self._search_sf,
            "budget_mult": self._budget_mult,
            "initial_lcp": self._initial_lcp,
            "transform": self._transform.tolist(),
            "qcentroid1": self._qcentroid1.tolist(),
            "qcentroid2": self._qcentroid2.tolist(),
            "base_ids": self._base_ids.tolist(),
            "congruent_ids": self._congruent_ids.tolist(),
        }

    def _import_state(self, state: dict):
        """Restore a checkpoint written by :meth:`export_state`. The
        trial counter also resumes the per-step PRNG stream, so a
        resumed run explores the trials an uninterrupted run would
        have."""
        self._trial = int(state["trial"])
        self._best_lcp = float(state["best_lcp"])
        self._best_rank = float(state.get("best_rank", -np.inf))
        self._budget_mult = int(state.get("budget_mult",
                                          self._budget_mult))
        sf = float(state.get("search_sf", self._search_sf))
        if sf != self._search_sf:
            # checkpoint was taken post-escalation: rebuild at its
            # factor so the resumed search continues where it left off
            self._search_sf = sf
            self._refine_jit = None
            self._build_step()
        self._initial_lcp = float(state.get("initial_lcp",
                                            self._initial_lcp))
        self._transform = np.asarray(state["transform"], np.float32)
        self._qcentroid1 = np.asarray(state["qcentroid1"], np.float32)
        self._qcentroid2 = np.asarray(state["qcentroid2"], np.float32)
        self._base_ids = np.asarray(state["base_ids"], np.int32)
        self._congruent_ids = np.asarray(state["congruent_ids"], np.int32)


class Match4PCS(Match4PCSBase):
    """Quadratic-mode matcher (ref:src/super4pcs/algorithms/4pcs.h:52):
    congruent join on invariant-point distance only."""
    _cone_mode = -1.0


class MatchSuper4PCS(Match4PCSBase):
    """Smart-indexing-mode matcher (ref:src/super4pcs/algorithms/
    super4pcs.h:56): adds the pair-direction cone filter to the join."""

    def __init__(self, options: Options, logger: Optional[Logger] = None,
                 mesh=None):
        super().__init__(options, logger, mesh=mesh)
        self._cone_mode = options.cone_cos_tolerance
