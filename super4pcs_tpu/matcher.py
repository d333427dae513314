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
from .kernels import rowcap_pallas
from .ops.band_extract import build_band_index, extract_pairs_banded
from .ops.masking import masked_indices
from .ops.pairs import (PairFilterConfig, extract_pairs,
                        extract_pairs_dense_rowcap,
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


def _kernel_filtered(opts: Options) -> bool:
    """Whether any per-pair filter is active (the Pallas capture kernel
    then carries the normals slab + score planes in VMEM, which lowers
    its size ceiling — see rowcap_pallas.MAX_N_FILTERED)."""
    return (opts.max_normal_difference > 0
            or opts.max_color_distance > 0
            or opts.max_translation_distance > 0
            or opts.max_angle > 0)


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
        # at nq=65536 the XLA rowcap's approx-top-k OOMs HBM (19.5 G >
        # 15.75 G) while banded runs 16.8 s/step. The PALLAS band
        # capture (kernels/rowcap_pallas.py) removes that OOM (no
        # materialized planes: 16-base capture 3.3 s at nq=65536 vs
        # banded's 8.3 s extraction + 46 s index build), so when it
        # applies rowcap carries to 65536. Since r5 the kernel applies
        # the normal/color/translation/angle filters in-VMEM too
        # (VERDICT r5 #2) — filtered configs no longer fall back to
        # the 1.29 TB/step XLA path at scale.
        pallas_ok = (opts.rowcap_kernel != "xla"
                     and rowcap_pallas.supported(
                         nq, filtered=_kernel_filtered(opts)))
        rowcap_top = 65536 if pallas_ok else 32768
        e = ("dense" if nq <= 2048
             else ("rowcap" if nq <= rowcap_top else "banded"))
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
        if (opts.max_normal_difference > 0 or opts.max_color_distance > 0
                or opts.max_translation_distance > 0):
            # the implicit table marks every ordered pair valid — there
            # is no extraction stage to apply per-pair filters, so a
            # filtered scale run would silently change semantics when
            # nq crosses the dense/allpairs boundary. Refuse loudly;
            # dense (nq <= 2048 / scale_max_q) applies the filters.
            raise ValueError(
                "pair_engine='allpairs' cannot apply pair-level filters "
                "(max_normal_difference/max_color_distance/"
                "max_translation_distance); reduce sample_size to "
                "<= 2048 (dense engine) or disable the filters")
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
    # Default candidate budget: a real COMPACTION cap, not the slot
    # count. b * k_quads slots are mostly invalid every step (validity
    # is data-dependent; the buffers are static), and the lossless
    # default made the step skip compaction and coarse-score every
    # slot — at the reference's own demo scale that was 112 GFLOP of
    # ~97%-invalid verify work per step (measured: verify 0.086 s of a
    # 0.31 s hippo step). 8x the exact-rank budget keeps the coarse
    # stage meaningful while the drop telemetry (cands_overflow)
    # reports any step that actually fills it.
    # toy scale (nq <= 1024): true congruent counts are ~hundreds per
    # step (hippo: ~440 valid of 106k slots) and the coarse stage's
    # cost is linear in this cap — 4096 measured quality-neutral vs
    # 16384 on hippo seeds (same LCP, same trials; r5 sweep) at less
    # verify work. cands_overflow telemetry flags any step that fills.
    default_cands = (4096 if nq <= 1024
                     else max(4096, 8 * max(opts.verify_top_k, 0)))
    n_cands = min(opts.max_candidates or default_cands,
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
    use_pk = False      # Pallas rowcap kernel; set on the rowcap branch

    if engine == "dense":
        join_row_cap = None
        # gather-free per-row capture when the per-row quota is small
        # (rigid configs: k_pairs ~ 16 * nq). Scale mode's capacity is
        # ~nq^2 (row_cap ~ nq would unroll nq reductions) and relies on
        # the rotated global-prefix rule — it keeps extract_pairs.
        dense_fast = (not opts.estimate_scale
                      and max(k_pairs // nq, 1) <= 64)
        _dense_fn = (extract_pairs_dense_rowcap if dense_fast
                     else extract_pairs)

        def _extract_both(pos, normal, rgb, bpos, bnorm, brgb, eps,
                          pcfg, col_offset=None, band=None,
                          inv1=None):
            ro = col_offset if rotate_dense else None
            return (_dense_fn(pos, normal, rgb, bpos, bnorm, brgb,
                              0, 1, eps, pcfg, capacity=k_pairs,
                              row_offset=ro),
                    _dense_fn(pos, normal, rgb, bpos, bnorm, brgb,
                              2, 3, eps, pcfg, capacity=k_pairs,
                              row_offset=ro))
    elif engine == "allpairs":
        join_row_cap = nq

        def _extract_both(pos, normal, rgb, bpos, bnorm, brgb, eps,
                          pcfg, col_offset=None, band=None,
                          inv1=None):
            # nothing to extract: the join derives pair (row, col) from
            # the slot index (allpairs_cols). Diagonal slots (t // nq ==
            # t % nq, i.e. t % (nq+1) == 0) are marked invalid so the
            # valid count matches the reported hit count nq * (nq - 1)
            # exactly (the scale-consistency gate would reject their
            # zero-length rows anyway; excluding them keeps telemetry
            # and probe selection consistent).
            valid = (jnp.arange(nq * nq, dtype=jnp.int32)
                     % (nq + 1)) != 0
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
        mean_occ = max(
            1.0, min(band_index.n / max(band_index.m, 1), float(pc)))
        es_target = max(4, int(2.0 * mean_occ * mean_occ))

        def _band_sizing(cap):
            ec = opts.band_expand_cap or _round_up(4 * cap, 128)
            cp = opts.band_cell_pair_cap or _round_up(
                min(max(ec // es_target, 2048), 262144), 128)
            return cp, min(ec, cp * pc * pc)

        # ASYMMETRIC capacities (VERDICT r3 #3): the congruent join uses
        # the first pair set as its hash TABLE (capture ratio feeds the
        # per-trial success rate -> full k_pairs) but probes only
        # join_q_budget second-side pairs per base — capturing 16*nq
        # pairs to probe 8192 of them was pure extraction waste (the
        # two-level strided capture is a uniform band subsample at ANY
        # capacity, so a ~4x-the-budget buffer probes the same
        # distribution). Measured at nq=65536: extraction 8.3 -> ~4 s
        # per step with unchanged join semantics.
        jqb = min(opts.join_q_budget or 8192, k_pairs)
        k2_cap = min(k_pairs, _round_up(4 * jqb, 128))
        cp1, ec1 = _band_sizing(k_pairs)
        cp2, ec2 = _band_sizing(k2_cap)

        def _extract_both(pos, normal, rgb, bpos, bnorm, brgb, eps,
                          pcfg, col_offset=None, band=None,
                          inv1=None):
            # ``band``: a traced per-pair index (the batched pairs-axis
            # vmap of parallel/batch.py maps over it); the single-pair
            # matcher's once-per-run index is the closure default
            idx = band if band is not None else band_index
            r1 = extract_pairs_banded(
                idx, pos, normal, rgb, bpos, bnorm, brgb,
                0, 1, eps, pcfg, cp1, rot_offset=col_offset,
                capacity=k_pairs, expand_cap=ec1)
            r2 = extract_pairs_banded(
                idx, pos, normal, rgb, bpos, bnorm, brgb,
                2, 3, eps, pcfg, cp2, rot_offset=col_offset,
                capacity=k2_cap, expand_cap=ec2)
            return r1, r2
    else:
        join_row_cap = opts.pair_row_cap or min(nq, max(32, _round_up(
            5 * k_pairs // (2 * nq), 32)))
        # Pallas band-capture kernel (kernels/rowcap_pallas.py) when
        # the config is pure-distance-band: the XLA path's
        # approx_max_k custom call materializes every block's key
        # plane + iota to HBM (measured 1.29 TB per device step at
        # nq=32768, b=16 — the real cost behind BASELINE r4's
        # "join memory-bound at 6% of peak"); the kernel keeps the
        # Theta(nq^2) evaluation in VMEM and writes only the capture
        # tables. Capture rule is segment-stratified (uniform over the
        # column range) instead of first-row_cap-in-rotated-order —
        # per-row counts stay exact, drops stay counted.
        use_pk = (opts.rowcap_kernel != "xla"
                  and rowcap_pallas.supported(
                      nq, filtered=_kernel_filtered(opts))
                  and not opts.estimate_scale)
        if use_pk:
            if opts.pair_row_cap is None and nq > 32768:
                # measured at nq=65536 (tools/scale_seeds.py): a
                # 128-slot table is quality-neutral vs 256 across weak
                # and strong seeds (LCP 0.849-0.873 either way) and
                # cuts the join table in half — ~26% step cut
                join_row_cap = min(join_row_cap, 128)
            join_row_cap = rowcap_pallas.slots_for(nq, join_row_cap)

            def _extract_both(pos, normal, rgb, bpos, bnorm, brgb,
                              eps, pcfg, col_offset=None, band=None,
                              inv1=None):
                # fused join hash (VERDICT r5 #1): the edge-0 capture
                # also emits each slot's invariant-point cell hash —
                # find_congruent_quads_grid(table_hash=...) then skips
                # its K1-gather hash stage entirely
                return rowcap_pallas.extract_pairs_rowcap_pallas_both(
                    pos, bpos, eps, join_row_cap,
                    invariant1=inv1, cell_size=cell_size,
                    normal=normal, rgb=rgb, base_norm=bnorm,
                    base_rgb=brgb,
                    max_normal_difference=opts.max_normal_difference,
                    max_color_distance=opts.max_color_distance,
                    max_translation_distance=(
                        opts.max_translation_distance),
                    max_angle=opts.max_angle,
                    tile_reject=opts.rowcap_tile_reject)
        else:
            # fused two-edge scan: shared geometry, one approx_max_k
            _extract_rowcap = functools.partial(
                extract_pairs_rowcap_layout_both, row_cap=join_row_cap,
                recall_target=opts.pair_recall_target, cols_only=True)

            def _extract_both(*a, col_offset=None, band=None,
                              inv1=None):
                return _extract_rowcap(*a, col_offset=col_offset)

    def _phase_costs(np_: int) -> dict:
        """First-order FLOPs + HBM bytes per phase of ONE device step
        (x bases_per_step), from the same static capacities that size
        the buffers — consumed by utils/roofline.attribute (VERDICT r3
        #2). Gathers count each logical byte once; sort bytes use the
        bitonic pass count lg*(lg+1)/2 XLA:TPU generates."""
        b = b_per_step
        # base selection: widest-triangle trials + the coplanar
        # 4th-point scan over all P (ref:match4pcsBase.cc:324-338)
        sel_fl = b * (n_tri * 40.0 + np_ * 24.0)
        sel_by = b * np_ * 12.0
        if engine == "dense":
            ex_fl = b * 2 * float(nq) * nq * 12.0
            ex_by = b * 2 * float(nq) * nq * 5.0
        elif engine == "allpairs":
            ex_fl = 0.0                  # the table is implicit
            ex_by = float(nq) * nq       # the hoisted validity vector
        elif engine == "banded":
            ex_fl = b * float(ec1 + ec2) * 24.0
            ex_by = b * (float(cp1 + cp2) * (2.0 * pc * 4.0 + 16.0)
                         + float(ec1 + ec2) * 36.0)
        elif use_pk:                     # Pallas band-capture kernel
            # in-VMEM Theta(nq^2) mask + lane scan; HBM = tables only
            # edge 0 additionally evaluates the fused join hash
            # (~15 ops/element) and writes the h1 plane
            ex_fl = b * float(nq) * nq * (40.0 + 25.0)
            ex_by = b * (float(nq) * join_row_cap * 12.0
                         + 2.0 * float(nq) * 4.0)
        else:                            # rowcap layout (approx_max_k)
            ex_fl = b * 2 * float(nq) * nq * 16.0
            # the PartialReduce custom call materializes each block's
            # f32 key plane + s32 iota (no producer fusion into custom
            # calls): 16 bytes per (row, col) per edge, dwarfing the
            # logical reads
            ex_by = b * 2 * (float(nq) * nq * 16.0
                             + float(nq) * join_row_cap * 8.0)
        k1 = float(nq) * join_row_cap if join_row_cap else float(k_pairs)
        k2_eff = float(k2_cap) if engine == "banded" else k1
        if dense_join:
            jn_fl = b * float(k_pairs) * k_pairs * 10.0
            jn_by = b * float(k_pairs) * k_pairs * 1.0
        else:
            qb = min(opts.join_q_budget or 8192, int(k2_eff))
            w = congruent.probe_window(dist_thr, cell_size)
            probes = float(qb) * w ** 3
            lg = max(math.log2(max(k1, 2.0)), 1.0)
            passes = lg * (lg + 1.0) / 2.0
            # bucket-seeded range-search rounds (ops/congruent.py r5)
            rounds = min(lg, max(12.0, (int(k1) >> 16)
                                 .bit_length() + 5.0))
            # the kernel path (use_pk) delivers the table hash from the
            # capture kernel: the k1-gather hash stage disappears from
            # the join (tools/join5_micro.py: 2.66 s of the 3.94 s
            # join at nq=32768 before the fusion)
            hash_fl = 0.0 if use_pk else k1 * 20.0
            hash_by = 0.0 if use_pk else k1 * 16.0
            jn_fl = b * (hash_fl + k1 * passes * 2.0
                         + probes * opts.cell_candidates * 10.0)
            jn_by = b * (hash_by + k1 * 8.0 * passes
                         + probes * (2.0 * rounds * 4.0
                                     + opts.cell_candidates * 8.0))
        ft_fl = b * float(k_quads) * 600.0
        ft_by = b * float(k_quads) * 96.0
        return {
            "select_extract": dict(flops=sel_fl + ex_fl,
                                   hbm_bytes=sel_by + ex_by),
            "join": dict(flops=jn_fl, hbm_bytes=jn_by),
            "fit": dict(flops=ft_fl, hbm_bytes=ft_by),
        }

    def try_base(key, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb,
                 band=None):
        ids, inv1, inv2, bvalid = select.select_base(
            key, p_pos, diam, n_tri)
        base_pos = p_pos[ids]
        base_norm = p_norm[ids]
        base_rgb = p_rgb[ids]

        # per-base column rotation decorrelates the row-cap capture
        # lottery across trials (see extract_pairs_rowcap)
        off = jax.random.randint(jax.random.fold_in(key, 7919), (),
                                 0, q_pos.shape[0])
        ext = _extract_both(
            q_pos, q_norm, q_rgb, base_pos, base_norm, base_rgb,
            eps_pairs, cfg, col_offset=off, band=band, inv1=inv1)
        (pairs1, v1, c1, d1), (pairs2, v2, c2, d2) = ext[0], ext[1]
        # Pallas capture path: the kernel-fused per-slot join hash
        thash = ext[2] if len(ext) > 2 else None

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
            q_sub = jnp.int32(0)
        else:
            quads, qvalid, qcount, qdropped, q_sub = \
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
                    table_hash=thash,
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
                    # In allpairs mode the nq^2-point invariant table
                    # occupies essentially every cell, so nearly all
                    # probes hit and compaction would only prefix-cut
                    # the probe sample (~4x effective-Q shrinkage) —
                    # disable it: no probe is ever dropped.
                    probe_budget=(
                        opts.join_probe_budget
                        or (None if engine == "allpairs" else
                            (2 * min(opts.join_q_budget or 8192,
                                     k_pairs if join_row_cap is None
                                     else (opts.join_q_budget or 8192))
                             * congruent.probe_window(
                                 dist_thr, cell_size) ** 3) // 8)))
        qvalid = qvalid & bvalid

        cand = q_pos[quads]                         # (Kq, 4, 3)
        centroid1 = base_pos[:3].mean(axis=0)       # ref:hpp:385
        centroid2 = cand[:, :3].mean(axis=1)        # ref:hpp:415-417
        transform, rms, tvalid = geometry.batched_rigid_fit(
            base_pos, cand, centroid1, centroid2, max_angle_rad,
            estimate_scale=opts.estimate_scale)
        cvalid = qvalid & tvalid & (rms >= 0) & (rms < rms_gate)

        # telemetry row: exact pre-cap pair counts, exact pre-cap quad
        # count, per-cell join drops, pairs actually dropped from the
        # buffers (incl. blocked-extraction per-block cap drops), and
        # the intentional Q-side probe-subsample volume (reported apart
        # from the drops so cap pressure stays observable — see
        # find_congruent_quads_grid)
        return dict(transform=transform, cvalid=cvalid,
                    centroid1=centroid1, centroid2=centroid2,
                    ids=ids, quads=quads,
                    counts=jnp.stack([c1, c2, qcount, qdropped,
                                      d1 + d2, q_sub]),
                    # intermediates for the phase probes (unused outputs
                    # are dead-code-eliminated from the production step;
                    # the allpairs engine has no pair arrays — its
                    # extraction phase is empty by construction)
                    _pairs_sum=(jnp.int32(0) if pairs1 is None else
                                jnp.sum(pairs1 * (v1[:, None]
                                                  if pairs1.ndim == 2
                                                  else v1))
                                + jnp.sum(pairs2 * (v2[:, None]
                                                    if pairs2.ndim == 2
                                                    else v2))),
                    _quads_sum=jnp.sum(quads * qvalid[:, None]))

    try_base.phase_costs = _phase_costs
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

    def step(keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb,
             band=None):
        """One device step over ``keys.shape[0]`` bases. Written to be
        shardable: under shard_map each device receives a slice of the
        keys axis and runs this same program on its shard. ``band``: an
        optional traced BandIndex — the pairs-axis vmap of
        parallel/batch.py maps over a batched one (the single-pair
        matcher bakes its index into the program as a constant)."""
        tb = jax.vmap(lambda k: try_base(
            k, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb,
            band=band))(keys)

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

    def _step_costs(np_: int) -> dict:
        """Full per-step cost model: the trial phases plus the LCP
        verify stage (whose FLOPs are exact: 8 per (candidate, q, p)
        triple — kernels/lcp_pallas.py). See utils/roofline."""
        costs = dict(try_base.phase_costs(np_))
        c = float(n_cands)
        tk = opts.verify_top_k
        if tk > 0 and c > tk:
            # coarse rank on ~coarse_q x ~coarse_p subsamples
            fl = c * min(opts.coarse_q, nq) * min(opts.coarse_p, np_) * 8.0
            by = c * 64.0
            if nq > 1024:   # mid stage + exact on the kept 64
                fl += tk * min(512, nq) * min(8192, np_) * 8.0
                fl += min(64, tk) * float(nq) * np_ * 8.0
                by += min(64, tk) * float(nq) * 12.0 + np_ * 12.0
            else:
                fl += tk * float(nq) * np_ * 8.0
                by += tk * float(nq) * 12.0 + np_ * 12.0
        else:
            fl = c * float(nq) * np_ * 8.0
            by = c * (float(nq) * 12.0 + 64.0) + np_ * 12.0
        costs["verify"] = dict(flops=fl, hbm_bytes=by)
        return costs

    step.cost_model = _step_costs
    return step, (k_pairs, k_quads, n_cands)


def resolve_steps_per_dispatch(opts: Options, nq: int,
                               mesh_size: int = 1) -> int:
    """Effective fused-dispatch depth (see Options.steps_per_dispatch):
    >1 only in the dispatch-bound toy-scale regime, on unsharded runs at
    the exact search factor (the coarse-rank redemption path is
    host-side)."""
    if mesh_size > 1 or opts.search_delta_factor != 1.0:
        return 1
    k = opts.steps_per_dispatch
    if k is None:
        k = 8 if nq <= 1024 else 1
    return max(int(k), 1)


def build_multi_step(opts: Options, nq: int, cone_tol: float,
                     band_index=None):
    """Fuse up to ``k_limit`` anytime device steps into ONE dispatch
    with an in-device early exit on the terminate threshold.

    At toy scale (the reference's own n=200 configs) a device step is
    tens of microseconds of compute but a host<->device round trip on a
    tunneled TPU is ~100 ms — the unfused anytime loop is pure dispatch
    latency there (BASELINE.md: serial CPU beat the r3 framework at
    hippo scale for exactly this reason). Fusing K steps in a
    lax.while_loop — exited the moment the carried best clears
    ``terminate_threshold`` — divides the round trips by up to K while
    preserving the anytime contract: the host checks the wall clock
    between dispatches, the trial budget bounds ``k_limit`` per
    dispatch (traced, so no recompile), and the PRNG stream is the
    unfused loop's exactly (fold_in(key, step_idx) per step), so a
    fused run explores the same trials in the same order.

    The in-loop guarded refine (Options.refine_iterations) moves into
    the device program: each improving step winner is polished and
    adopted only if its exact-delta LCP wins — the same decision rule
    the host loop applies, minus the extra round trip per improvement.

    The search state (best transform / LCP / step counter) is PACKED
    into two small vectors that live on the device between dispatches
    (outputs fed back as inputs): per dispatch the host uploads one
    scalar (``k_limit``) and fetches three tiny buffers in one
    device_get — on a tunneled device every host<->device array is a
    round trip, and at toy scale those round trips ARE the runtime.

    Signature of the returned function::

        multi(key_data, k_limit, state_f, state_i, diam,
              p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb)
        -> (state_f', state_i', row)

    ``state_f`` (23,) f32: [best_lcp, transform(16), qcentroid1(3),
    qcentroid2(3)]. ``state_i`` (9,) i32: [step_counter, base_ids(4),
    congruent_ids(4)]. ``row`` (7,) i32: (steps_done, pairs_overflow,
    quads_overflow, cell_dropped, q_sampled_out, n_congruent,
    cands_dropped) for this dispatch.

    Returns (multi, caps) with caps as in :func:`build_step`.
    """
    if opts.bases_per_step is None:
        opts = opts.replace(bases_per_step=resolve_bases_per_step(opts, nq))
    step, caps = build_step(opts, nq, cone_tol, band_index=band_index)
    k_quads = caps[1]
    b = opts.bases_per_step
    delta = opts.delta
    term = float(opts.terminate_threshold)
    iters = opts.refine_iterations
    est_scale = opts.estimate_scale

    def multi(key_data, k_limit, state_f, state_i, diam,
              p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb):
        base_key = jax.random.wrap_key_data(key_data)
        step0 = state_i[0]

        def body(carry):
            (i, best, tr, qc1, qc2, bids, cids,
             tele, ncong, cdrop) = carry
            keys = jax.random.split(
                jax.random.fold_in(base_key, step0 + i), b)
            out = step(keys, diam, p_pos, p_norm, p_rgb,
                       q_pos, q_norm, q_rgb)
            counts = out["pair_counts"]
            tele = tele + jnp.stack(
                [jnp.sum(counts[:, 4]),
                 jnp.sum(jnp.maximum(counts[:, 2] - k_quads, 0)),
                 jnp.sum(counts[:, 3]), jnp.sum(counts[:, 5])])
            ncong = ncong + out["n_congruent"]
            cdrop = cdrop + out["cands_dropped"]

            step_lcp = out["lcp"]
            improved = step_lcp > best

            if iters > 0:
                def polish(_):
                    refined = refine.refine_transform(
                        out["transform"], q_pos, p_pos, delta,
                        iters=iters, start_factor=1.0,
                        estimate_scale=est_scale)
                    sc = lcp.lcp_score_single(
                        refined, q_pos, p_pos, jnp.float32(delta))
                    use = sc > step_lcp
                    return (jnp.maximum(sc, step_lcp),
                            jnp.where(use, refined, out["transform"]),
                            jnp.where(use, refined[:3, 3],
                                      out["qcentroid1"]),
                            jnp.where(use, jnp.zeros(3, jnp.float32),
                                      out["qcentroid2"]))

                def keep(_):
                    return (step_lcp, out["transform"],
                            out["qcentroid1"], out["qcentroid2"])

                cand_lcp, cand_tr, cand_qc1, cand_qc2 = jax.lax.cond(
                    improved, polish, keep, None)
            else:
                cand_lcp, cand_tr, cand_qc1, cand_qc2 = (
                    step_lcp, out["transform"], out["qcentroid1"],
                    out["qcentroid2"])

            adopt = cand_lcp > best
            best = jnp.where(adopt, cand_lcp, best)
            tr = jnp.where(adopt, cand_tr, tr)
            qc1 = jnp.where(adopt, cand_qc1, qc1)
            qc2 = jnp.where(adopt, cand_qc2, qc2)
            bids = jnp.where(adopt, out["base_ids"], bids)
            cids = jnp.where(adopt, out["congruent_ids"], cids)
            return (i + jnp.int32(1), best, tr, qc1, qc2, bids, cids,
                    tele, ncong, cdrop)

        def cond(carry):
            i, best = carry[0], carry[1]
            return (i < k_limit) & (best <= term) & (best < 1.0)

        init = (jnp.int32(0), state_f[0],
                state_f[1:17].reshape(4, 4), state_f[17:20],
                state_f[20:23], state_i[1:5], state_i[5:9],
                jnp.zeros(4, jnp.int32), jnp.int32(0), jnp.int32(0))
        (i, best, tr, qc1, qc2, bids, cids, tele, ncong, cdrop) = \
            jax.lax.while_loop(cond, body, init)
        new_f = jnp.concatenate([best[None], tr.reshape(16), qc1, qc2])
        new_i = jnp.concatenate([(step0 + i)[None], bids, cids])
        row = jnp.concatenate([i[None], tele, ncong[None], cdrop[None]])
        return new_f, new_i, row

    return multi, caps


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

        opts = self.options
        if (opts.estimate_scale and opts.scale_hierarchical
                and resume_state is None
                and opts.sample_size > opts.scale_max_q):
            return self._compute_scale_hierarchical(P, Q, visitor)

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

    def _compute_scale_hierarchical(self, P: PointCloud, Q: PointCloud,
                                    visitor) -> RegistrationResult:
        """Two-phase similarity registration above the scale-mode
        sample ceiling (see Options.scale_hierarchical, VERDICT r4 #8):

        1. COARSE: similarity solve at ``scale_max_q`` samples — the
           allpairs engine is exact there — recovers the global scale
           ``s`` (and a pose the fine phase does not reuse: RANSAC at
           full resolution is cheaper than trusting a coarse pose);
        2. FINE: Q rescaled by ``s`` makes the problem rigid, so the
           full-resolution solve rides the distance-banded fast path
           (dense/rowcap/Pallas engines at any nq). The returned
           transform composes the rescale: ``M = T_fine @ diag(s)``.

        The residual coarse-scale error (measured 0.08% at nq=2500,
        BASELINE.md r3) lands well inside the fine delta; the fine
        phase registers it away as pose, so the composed similarity
        meets the sub-0.5% scale contract without a second scale fit.
        """
        opts = self.options
        needs_global = visitor_needs_global(visitor)
        coarse_opts = opts.replace(
            sample_size=opts.scale_max_q,
            # phase budget: the coarse solve at <=2048 samples measured
            # seconds-scale (BASELINE.md r3: 11.5 s at nq=2500); cap it
            # at 40% so the fine phase always keeps the larger share
            max_time_seconds=max(opts.max_time_seconds * 0.4, 1.0))
        t0 = time.perf_counter()

        def coarse_visitor(fraction, lcp, transform):
            # coarse progress maps to the first half of the stream;
            # its transforms already act on the ORIGINAL Q
            visitor(fraction if fraction < 0 else 0.5 * min(fraction, 1.0),
                    lcp, transform)

        coarse_visitor.needs_global_transformation = lambda: needs_global
        coarse = type(self)(coarse_opts, self.logger, mesh=self._mesh) \
            .compute_transformation(P, Q, visitor=coarse_visitor)
        coarse_s = time.perf_counter() - t0
        if not coarse.improved:
            coarse.stats["scale_hierarchical"] = "coarse_failed"
            return coarse
        # similarity scale of the coarse transform (columns of s*R all
        # have norm s; the determinant cube root is rotation-robust)
        s = float(abs(np.linalg.det(
            np.asarray(coarse.transform)[:3, :3]))) ** (1.0 / 3.0)

        q2 = PointCloud(
            pos=(np.asarray(Q.pos, np.float32) * np.float32(s)),
            normal=Q.normal, rgb=Q.rgb)
        remaining = max(opts.max_time_seconds - coarse_s, 1.0)
        fine_opts = opts.replace(estimate_scale=False,
                                 max_time_seconds=remaining)
        scale_mat = np.diag([s, s, s, 1.0]).astype(np.float32)

        def fine_visitor(fraction, lcp, transform):
            # fine transforms act on s*Q; global-frame consumers get
            # the composed similarity on the original Q
            t = (np.asarray(transform) @ scale_mat if needs_global
                 else transform)
            visitor(fraction if fraction < 0
                    else 0.5 + 0.5 * min(fraction, 1.0), lcp, t)

        fine_visitor.needs_global_transformation = lambda: needs_global
        fine = type(self)(fine_opts, self.logger, mesh=self._mesh) \
            .compute_transformation(P, q2, visitor=fine_visitor)

        stats = dict(fine.stats)
        stats["hierarchical_scale"] = s
        stats["coarse_search_seconds"] = coarse.stats.get(
            "search_seconds", coarse_s)
        stats["coarse_lcp"] = coarse.score
        stats["coarse_trials"] = coarse.n_trials
        if not fine.improved:
            # the fine phase found nothing better than identity-on-s*Q;
            # fall back to the coarse similarity result outright
            coarse.stats.update(stats)
            coarse.stats["scale_hierarchical"] = "fine_failed"
            return coarse
        mat = np.asarray(fine.transform, np.float32) @ scale_mat
        transformed_q = Q.transformed(mat)
        return RegistrationResult(
            score=fine.score, transform=mat,
            transformed_q=transformed_q,
            n_trials=coarse.n_trials + fine.n_trials,
            improved=True, stats=stats)

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
        # Spatially order the Q samples (kd median-split blocks): a
        # fixed permutation is semantically transparent (RANSAC draws
        # by index, outputs are transforms), and spatially coherent
        # memory order is what arms the Pallas capture kernel's
        # tile-pair band rejection (kernels/rowcap_pallas.py, r5 tile
        # reject; kd blocks measured ~2x the rejection rate of a
        # Morton order). Scale mode is exempt: its engines
        # (dense/allpairs) have no tile rejection to arm, so
        # reordering would only reshuffle the RANSAC lottery there
        # (measured: a 4.3% coarse-scale outlier on a previously
        # sub-0.5% seed) for zero kernel benefit.
        if not opts.estimate_scale:
            sampled_q = sampled_q.take(
                sampling.kd_argsort(sampled_q.pos))
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
        #: escalation rungs climbed (see Options.search_escalation_stages)
        self._esc_stage = 0
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
                "band_cell_size": float(self._band_index.g),
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
            "q_sampled_out": 0,
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
        # fused K-step dispatch for the dispatch-bound toy-scale regime
        # (see build_multi_step); the per-step program above remains the
        # escalation/phase-probe path
        self._fused_k = resolve_steps_per_dispatch(
            opts, nq, self._mesh.size if self._mesh is not None else 1)
        if self._fused_k > 1:
            multi, _ = build_multi_step(opts, nq, self._cone_mode,
                                        band_index=self._band_index)
            self._multi_fn = jax.jit(multi)
        else:
            self._multi_fn = None

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
        if self._multi_fn is not None:
            self._key_data = jnp.asarray(jax.random.key_data(self._key))
            sf0, si0 = self._fused_state()
            margs = (self._key_data, jnp.int32(1), sf0, si0,
                     diam, self._d_p_pos, self._d_p_norm, self._d_p_rgb,
                     self._d_q_pos, self._d_q_norm, self._d_q_rgb)
            self._multi_fn = self._multi_fn.lower(*margs).compile()
        self._stats["compile_seconds"] = time.perf_counter() - tc

        # Speculative escalation compile (VERDICT r3 #1): the escalated
        # program's XLA compile used to run INSIDE the anytime clock —
        # a documented ~100 s budget overrun on a cold cache (the r3
        # worst seed: 153.7 s vs a 120 s budget). Now it compiles on a
        # worker thread concurrently with the search; when the trial
        # estimate exhausts, escalation is a pointer swap, and if the
        # compile is still in flight the loop keeps searching at the
        # current factor instead of blocking — the wall-clock contract
        # (fraction_time >= 0.99 stop) holds on every seed by
        # construction.
        #
        # The compile is armed LAZILY (the first time a loop observes
        # fraction_try >= _ESC_ARM_FRACTION without having hit the
        # threshold), not at search start: most runs terminate within
        # the first dispatches, and an always-on speculative compile
        # (a) wastes a full program build per run and (b) contends
        # with the search's device RPCs on a tunneled backend
        # (measured: hippo-scale runs stalling minutes in PJRT
        # teardown behind an orphaned in-flight compile).
        self._esc_prep = None
        self._esc_args = args
        self._esc_enabled = (
            self._esc_next_factor() > self._search_sf
            and self._refine_active())

        if opts.phase_timing:
            self._measure_phases(args)

        t0 = time.perf_counter()

        if self._multi_fn is not None:
            done = self._fused_anytime_loop(visitor, needs_global,
                                            diam, t0)
            if done or (self._esc_prep is None
                        and not opts.use_full_time_budget):
                self._stats["search_seconds"] = time.perf_counter() - t0
                return
            # trial estimate exhausted below the threshold: fall through
            # to the per-step loop, which keeps searching while the
            # background-compiled escalated program finishes compiling
            # (or burns the remaining wall budget under
            # use_full_time_budget)

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

        # Predictive deadline guard: at large nq a single step is tens
        # of seconds, so "check the clock between steps" alone can
        # overrun max_time_seconds by one whole step (measured: 212.6 s
        # on a 180 s budget at nq=65536 — an escalated-step latency).
        # Track an EMA of step latency and stop LAUNCHING once the
        # remaining budget cannot fit another step; stopping one step
        # early is conservative-safe under the reference's stop rule.
        step_ema = 0.0
        t_last = time.perf_counter()

        def budget_left(extra=1.0):
            return (time.perf_counter() - t0 + extra * step_ema
                    <= 0.99 * opts.max_time_seconds)

        inflight = [launch(step_idx)]
        while True:
            if budget_left(extra=2.0):  # this fetch + the new step
                inflight.append(launch(step_idx + 1))
            if not inflight:
                # deadline guard drained the pipeline: no remaining
                # budget for another step
                break
            # one device->host transfer per step: each fetch is a full
            # round-trip on a remote/tunneled device
            out = jax.device_get(inflight.pop(0))
            now = time.perf_counter()
            step_ema = (now - t_last if step_ema == 0.0
                        else 0.5 * step_ema + 0.5 * (now - t_last))
            t_last = now
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
            self._stats["q_sampled_out"] += int(counts[:, 5].sum())
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
            self._maybe_arm_escalation(fraction_try, fraction_time)
            if fraction_try >= 0.99 or self._trial > self._trial_budget:
                # trial estimate exhausted below the threshold: escalate
                # the search factor when configured (see
                # Options.search_escalation_factor), else stop as the
                # reference would. The escalated program compiles on a
                # worker thread (started with the base compile); the
                # swap here costs nothing, and while the compile is
                # still in flight the loop keeps running base-factor
                # steps — never a blocking wait inside the clock.
                prep = self._esc_prep
                remaining = opts.max_time_seconds * (1.0 - fraction_time)
                if (prep is not None
                        and remaining > 0.05 * opts.max_time_seconds):
                    if not prep["done"].is_set():
                        continue      # compile in flight: keep searching
                    self._esc_prep = None
                    if prep.get("error") is not None:
                        self.logger.error(
                            "escalation compile failed: ", prep["error"])
                    else:
                        self._adopt_escalation(prep)
                        # the deadline guard's EMA was learned on
                        # base-factor steps; escalated steps are ~2-3x
                        # slower (wider bands -> bigger tables), so an
                        # unscaled prediction overruns by one escalated
                        # step (measured: 181.8 s on a 180 s budget at
                        # nq=65536). Inflate now; the 0.5-alpha EMA
                        # re-learns the true latency within two steps.
                        step_ema *= 3.0
                        # relaunch with the escalated program; the
                        # discarded in-flight step's keys are
                        # re-explored at the wider tolerance
                        inflight = [launch(step_idx)]
                        continue
                if not opts.use_full_time_budget:
                    break

        # search time excluding the one-time compile (the reference's
        # totalTime analog, ref:match4pcsBase.hpp:77-83)
        self._stats["search_seconds"] = time.perf_counter() - t0

    def _fused_state(self):
        """PACKED device-resident fused-loop state from the current host
        best (see build_multi_step: state_f (23,) f32 = [best_lcp,
        transform(16), qcentroid1(3), qcentroid2(3)]; state_i (9,) i32 =
        [step_counter, base_ids(4), congruent_ids(4)]). Uploaded once
        per loop entry; between dispatches it stays on device (outputs
        fed back as inputs)."""
        state_f = np.concatenate([
            np.asarray([self._best_lcp], np.float32),
            np.asarray(self._transform, np.float32).reshape(16),
            np.asarray(self._qcentroid1, np.float32),
            np.asarray(self._qcentroid2, np.float32)])
        state_i = np.concatenate([
            np.asarray([self._trial // self._b_eff], np.int32),
            np.asarray(self._base_ids, np.int32),
            np.asarray(self._congruent_ids, np.int32)])
        return jnp.asarray(state_f), jnp.asarray(state_i)

    def _apply_fused_state(self, host_f, host_i):
        """Unpack fetched fused-loop state into the host best-so-far."""
        self._best_lcp = float(host_f[0])
        self._transform = np.asarray(host_f[1:17],
                                     np.float32).reshape(4, 4)
        self._qcentroid1 = np.asarray(host_f[17:20], np.float32)
        self._qcentroid2 = np.asarray(host_f[20:23], np.float32)
        self._base_ids = np.asarray(host_i[1:5], np.int32)
        self._congruent_ids = np.asarray(host_i[5:9], np.int32)

    def _fused_anytime_loop(self, visitor, needs_global, diam, t0):
        """Anytime loop over fused K-step dispatches (see
        :func:`build_multi_step`): one device round trip per up-to-K
        steps, in-device early exit on the terminate threshold, wall
        clock checked between dispatches, search state resident on
        device (the host fetches one scalar + one telemetry row per
        dispatch, and the full state only on improvement / at exit).
        Returns True when a stop rule fired (threshold / wall clock /
        LCP 1.0), False when the trial estimate exhausted below the
        threshold (the caller escalates or stops)."""
        opts = self.options
        b = self._b_eff
        # per-step trial-budget granularity, matching the unfused loop:
        # steps allowed before fraction_try >= 0.99
        steps_total = max(int(math.ceil(0.99 * self._trial_budget / b)),
                          1)
        state_f, state_i = self._fused_state()
        cloud_args = (diam, self._d_p_pos, self._d_p_norm, self._d_p_rgb,
                      self._d_q_pos, self._d_q_norm, self._d_q_rgb)
        self._stats.setdefault("fused_dispatches", 0)
        while True:
            steps_done = self._trial // b
            if opts.use_full_time_budget:
                k_lim = self._fused_k
            else:
                k_lim = max(1, min(self._fused_k,
                                   steps_total - steps_done))
            state_f, state_i, row_dev = self._multi_fn(
                self._key_data, jnp.int32(k_lim), state_f, state_i,
                *cloud_args)
            # ONE round trip per dispatch: the whole packed state is
            # ~150 bytes, so fetching it alongside the telemetry row
            # costs nothing extra on the wire
            host_f, host_i, row = jax.device_get(
                (state_f, state_i, row_dev))
            row = np.asarray(row)
            self._stats["fused_dispatches"] += 1
            self._trial += int(row[0]) * b
            self._stats["pairs_overflow"] += int(row[1])
            self._stats["quads_overflow"] += int(row[2])
            self._stats["cell_dropped"] += int(row[3])
            self._stats["q_sampled_out"] += int(row[4])
            self._stats["n_congruent"] += int(row[5])
            self._stats["cands_overflow"] += int(row[6])

            if float(host_f[0]) > self._best_lcp:
                self._apply_fused_state(host_f, host_i)
                visitor(-1.0, self._best_lcp,
                        self._visitor_transform(needs_global))
            self._best_rank = max(self._best_rank, self._best_lcp)

            fraction_try = self._trial / self._trial_budget
            fraction_time = ((time.perf_counter() - t0)
                             / opts.max_time_seconds)
            fraction = (fraction_time if opts.use_full_time_budget
                        else max(fraction_time, fraction_try))
            visitor(min(fraction, 1.0), self._best_lcp,
                    self._visitor_transform(needs_global))

            if (self._best_lcp > opts.terminate_threshold
                    or fraction_time >= 0.99
                    or self._best_lcp == 1.0):
                return True
            self._maybe_arm_escalation(fraction_try, fraction_time)
            if fraction_try >= 0.99 or self._trial > self._trial_budget:
                # a fused dispatch can jump straight past exhaustion
                # (k_lim steps at once): make sure the compile is armed
                # before handing the caller an escalation decision
                self._maybe_arm_escalation(1.0, fraction_time)
                if (opts.use_full_time_budget
                        and self._esc_prep is None):
                    continue
                return False

    #: fraction of the trial budget burned below the threshold before
    #: the speculative escalation compile is armed — early enough that
    #: a warm (~2-5 s) compile finishes well before exhaustion, late
    #: enough that runs solving in the first dispatches never pay it
    _ESC_ARM_FRACTION = 0.35

    def _esc_next_factor(self) -> float:
        """The next escalation rung's search factor: rung ``s``
        searches at ``search_escalation_factor ** s`` (see
        Options.search_escalation_stages — VERDICT r4 #5's second
        rung for seeds whose first escalated estimate also exhausts)."""
        opts = self.options
        if self._esc_stage >= opts.search_escalation_stages:
            return 0.0
        if self._esc_stage >= 1 and int(self._d_q_pos.shape[0]) > 16384:
            # rung >= 2 quadruples the band width: above nq=16384 the
            # factor^2 program's pair tables blow past the taper (its
            # XLA build alone runs many minutes, and an armed-but-
            # unused compile stalls teardown for as long) while the
            # 128-slot capture turns almost pure drop — not a usable
            # recourse at that scale. The wall budget remains the
            # final stop there (use_full_time_budget keeps searching).
            return 0.0
        return float(opts.search_escalation_factor
                     ** (self._esc_stage + 1))

    def _maybe_arm_escalation(self, fraction_try: float,
                              fraction_time: float = 0.0):
        """Arm the background escalation compile once the run has
        burned ``_ESC_ARM_FRACTION`` of the CURRENT rung's trial
        extension below the threshold (see _perform_steps: lazy
        arming). The rung spans trial fractions
        [(mult-1)/mult, 1] of the extended budget. LARGE programs
        (nq > 4096) already past 75% of their WALL budget never arm:
        the adoption gate (>=5% remaining) would likely reject the
        swap anyway, and an armed-but-unused compile delays process
        teardown by a full cold build (the non-daemon thread is
        deliberately joined at exit to protect the persistent cache).
        Small programs are exempt — their compiles are seconds, so a
        late arm still rescues a slow run (a 1-core CI host stretches
        step latency enough that trial exhaustion can land past 75%
        wall; the banded overflow-pressure test relies on exactly
        this late escalation)."""
        mult = self._budget_mult
        gate = (mult - 1.0 + self._ESC_ARM_FRACTION) / mult
        wall_ok = (int(self._d_q_pos.shape[0]) <= 4096
                   or fraction_time < 0.75)
        if (self._esc_prep is None and self._esc_enabled
                and wall_ok
                and fraction_try >= gate):
            self._esc_prep = self._start_escalation_compile(
                self._esc_next_factor(), self._esc_args)

    def _start_escalation_compile(self, esc: float, args):
        """Build + compile the escalated-factor step and refine programs
        on a worker thread, concurrently with the search (the anytime
        clock never pays for them). Returns a holder dict the loop
        polls: {"done": Event, "step", "refine", "caps",
        "compile_seconds"} or {"error"} on failure. The thread only
        reads state captured here — it never mutates the matcher.

        The thread is NON-daemon: if the search terminates while the
        compile is in flight, interpreter shutdown waits for it instead
        of killing it mid-RPC (a daemon thread inside a PJRT compile
        call aborts finalization — and the persistent-cache entry the
        compile was about to write would be lost, so every later run
        would repeat the cold compile). The wait happens after results
        are delivered and only when escalation was armed but unused."""
        import threading

        holder = {"done": threading.Event(), "error": None, "esc": esc}
        opts = self.options.replace(search_delta_factor=esc,
                                    bases_per_step=self._b_eff)
        nq = int(self._d_q_pos.shape[0])
        mesh = self._mesh
        band_index = self._band_index
        cone = self._cone_mode
        q_pos, p_pos = self._d_q_pos, self._d_p_pos

        def work():
            try:
                t0 = time.perf_counter()
                step, caps = build_step(opts, nq, cone,
                                        band_index=band_index)
                if mesh is not None:
                    from .parallel import sharded_step
                    fn = sharded_step(
                        step, mesh,
                        gather_telemetry=opts.sharded_gather_telemetry)
                else:
                    fn = jax.jit(step)
                holder["step"] = fn.lower(*args).compile()
                holder["caps"] = caps
                holder["refine"] = self._build_refine(esc).lower(
                    jnp.eye(4, dtype=jnp.float32), q_pos, p_pos).compile()
                holder["compile_seconds"] = time.perf_counter() - t0
            except Exception as e:  # surfaced by the adopting loop
                holder["error"] = e
            finally:
                holder["done"].set()

        threading.Thread(target=work, daemon=False,
                         name="super4pcs-escalation-compile").start()
        return holder

    def _adopt_escalation(self, prep):
        """Swap in the background-compiled escalated programs and extend
        the trial budget by another estimate. O(1) — no compile inside
        the anytime clock (the VERDICT r3 #1 contract:
        stats["escalation_compile_seconds"] ~= 0)."""
        esc = prep["esc"]
        self.logger.verbose("Trial estimate exhausted at LCP ",
                            self._best_lcp,
                            "; escalating search_delta_factor to ", esc)
        self._search_sf = esc
        self._esc_stage += 1
        # more rungs on the ladder? (Options.search_escalation_stages)
        self._esc_enabled = (self._esc_next_factor() > self._search_sf
                             and self._refine_active())
        self._step_fn = prep["step"]
        self._refine_jit = prep["refine"]
        self._k_pairs, self._k_quads, self._n_cands = prep["caps"]
        self._budget_mult += 1
        # in-clock cost of escalating (the old blocking rebuild); the
        # real compile time, paid concurrently off the clock, is
        # reported separately
        self._stats["escalation_compile_seconds"] = 0.0
        self._stats["escalation_bg_compile_seconds"] = (
            prep.get("compile_seconds", 0.0))
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

        # roofline attribution (VERDICT r3 #2): join the analytic
        # FLOPs/bytes model the step builder attached with the measured
        # seconds — stats say which phase is compute/memory/dispatch-
        # bound and the headroom to the v5e ceilings
        cost_model = getattr(self._step_raw, "cost_model", None)
        if cost_model is not None:
            from .utils import roofline
            costs = cost_model(int(self._d_p_pos.shape[0]))
            roof = roofline.attribute(costs, dict(timers.phases))
            self._stats["phase_roofline"] = roof
            self.logger.verbose(roofline.table(roof))

    def _build_refine(self, sf: float):
        """Jitted program: trimmed-ICP refine + exact LCP of both the
        current and refined transforms, at search factor ``sf``."""
        opts = self.options
        iters = opts.refine_iterations
        delta = opts.delta

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

        return jax.jit(rf)

    def _refine_fn(self):
        """The refine program at the LIVE search factor. Built once per
        run so the in-loop refinement (see :meth:`_perform_steps`) costs
        one warm dispatch, and pre-compiled with the step so its compile
        stays off the anytime clock."""
        if self._refine_jit is None:
            self._refine_jit = self._build_refine(self._search_sf)
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
        # one budget extension per rung climbed
        self._esc_stage = self._budget_mult - 1
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
