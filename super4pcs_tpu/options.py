"""Registration options.

TPU-native equivalent of the reference ``Match4PCSOptions``
(ref:src/super4pcs/shared4pcs.h:148-190): a frozen dataclass so it can be
hashed and closed over by jitted step functions. Library defaults match
the reference library layer (delta=5.0, overlap=0.2, n=200, t=60 s); the
CLI layer overrides max_time_seconds to 10 s, mirroring
ref:demos/demo-utils.h:80-102.

On top of the reference fields we expose the static capacities that make
the data-dependent parts of the algorithm compile to fixed shapes on TPU
(pair/quad buffer caps, bases per device step). These have no reference
counterpart — the reference grows std::vectors; XLA needs static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# std::mt19937::default_seed — ref:src/super4pcs/shared4pcs.h:171
MT19937_DEFAULT_SEED = 5489


@dataclasses.dataclass(frozen=True)
class Options:
    # --- reference-visible parameters (ref:shared4pcs.h:148-190) ---
    #: LCP distance threshold; also the voxel size of the uniform sampler.
    delta: float = 5.0
    #: Maximum normal difference in degrees between paired points (<0: off).
    max_normal_difference: float = -1.0
    #: Maximum translation distance (<0: off).
    max_translation_distance: float = -1.0
    #: Maximum rotation angle in degrees (<0: off).
    max_angle: float = -1.0
    #: Maximum RGB color distance between corresponding vertices (<0: off).
    max_color_distance: float = -1.0
    #: Number of points sampled from Q (P keeps its full voxel-sampled set,
    #: mirroring ref:match4pcsBase.hpp:112-138).
    sample_size: int = 200
    #: Anytime budget in seconds (ref:shared4pcs.h:166-169).
    max_time_seconds: int = 60
    #: RNG seed (ref:shared4pcs.h:171).
    random_seed: int = MT19937_DEFAULT_SEED
    #: Estimate a similarity (scaled-rigid) transform instead of rigid —
    #: the reference's compile-time MULTISCALE mode (off by default
    #: there too): the pair distance filter is disabled and the fit
    #: estimates a per-candidate scale from the two segment ratios,
    #: rejecting candidates whose ratios deviate > 10%
    #: (ref:match4pcsBase.cc:390-414, 4pcs.cc:141-143). Expect far more
    #: pairs — raise max_pairs accordingly.
    estimate_scale: bool = False

    # validated pair, set via configure_overlap (ref:shared4pcs.h:173-190)
    overlap_estimation: float = 0.2
    terminate_threshold: float = 1.0

    # --- TPU execution shape parameters (no reference counterpart) ---
    #: Bases attempted per jitted device step (vmapped RANSAC width).
    #: ``None`` (the default) derives it from the sampled-Q size at
    #: matcher init: 16 at nq > 1024, else 64 — at toy scales (the
    #: reference's own n=200 configs) per-step device work is tens of
    #: microseconds and the host<->device dispatch round-trip dominates,
    #: so fusing more trials per step is free throughput. Set explicitly
    #: to pin the step shape (required to divide the mesh size in
    #: bases-axis sharded runs; the auto value is rounded up to a
    #: multiple of it).
    bases_per_step: Optional[int] = None
    #: Static capacity of each per-base extracted-pair buffer. ``None``
    #: derives a capacity from the sampled-Q size at matcher init.
    max_pairs: Optional[int] = None
    #: Static capacity of the per-base congruent-quad buffer. ``None``
    #: derives from the pair capacity. Candidates beyond capacity are
    #: dropped (and counted in stats) — the reference scores every
    #: congruent quad, so capacities must be generous, not minimal.
    max_quads: Optional[int] = None
    #: Cap on candidates LCP-scored per device step. ``None`` scores all
    #: bases_per_step * max_quads candidates (the reference semantics).
    max_candidates: Optional[int] = None
    #: Per-row hit cap of the large-nq (> 2048) pair extraction
    #: (ops/pairs.py extract_pairs_rowcap). ``None`` derives
    #: ~4 * max_pairs / nq. Larger values capture more of each row's
    #: hits (closer to the reference's keep-everything semantics) at
    #: ~linear extraction cost; clipped tails are counted in
    #: stats["pairs_overflow"].
    pair_row_cap: Optional[int] = None
    #: approx_max_k recall target of the row-capped extraction's per-row
    #: compaction (nq > 2048 path). The TPU partial-reduction cost falls
    #: steeply with the target (0.95 -> 0.85 measured 6x cheaper at
    #: nq=8192, k=160); missed hits are uniformly spread, counted in
    #: stats["pairs_overflow"], and decorrelated across trials by the
    #: per-base column rotation. On CPU the op is exact regardless.
    pair_recall_target: float = 0.9
    #: Rowcap extraction backend: "auto" uses the Pallas band-capture
    #: kernel (kernels/rowcap_pallas.py) on TPU for pure
    #: distance-band configs — the XLA approx_max_k path materializes
    #: every block's key plane + iota to HBM (measured 1.29 TB per
    #: device step at nq=32768), the kernel writes only the capture
    #: tables. "xla" forces the approx_max_k path (applies the full
    #: filter set; first-N-in-rotated-order capture instead of the
    #: kernel's segment-stratified capture).
    rowcap_kernel: str = "auto"
    #: Tile-pair band rejection inside the Pallas capture kernel: per
    #: (256-row, 512-col) tile pair, a bounding-sphere test against the
    #: distance band skips the whole MXU/mask/capture body when no pair
    #: can fall in the band (conservative triangle-inequality bound —
    #: per-row counts stay exact). Effective because matcher._init
    #: Morton-orders the Q samples, making tiles spatially compact.
    #: Safety valve only; there is no known reason to disable it.
    rowcap_tile_reject: bool = True
    #: Cosine tolerance of the Super4PCS pair-direction cone filter. The
    #: reference realizes this filter as a 7^3-bin direction-grid cone
    #: rasterization (ref:accelerators/normalset.hpp:162-210); the bin
    #: resolution makes its effective tolerance ~2/7 in component space.
    cone_cos_tolerance: float = 0.30
    #: Number of random triangle draws when picking a wide base triangle
    #: (ref:match4pcsBase.h:79 kNumberOfDiameterTrials).
    n_triangle_trials: int = 1000
    #: Per-cell candidate cap of the grid-hash congruent join (the TPU
    #: replacement for the reference's pointer grid; overflow beyond the
    #: cap is counted in stats["cell_dropped"]).
    cell_candidates: int = 16
    #: Second-side pair budget of the grid join: at most this many
    #: (valid) Q-side pairs are probed per base (``None`` -> all, up to
    #: 8192). Q samples are pre-shuffled, so the budgeted subset is a
    #: uniform random subsample; skipped pairs are counted in
    #: stats["q_sampled_out"] (x w^3 probe units, w = the join's probe
    #: window) — intentional subsampling, reported apart from the
    #: capacity-pressure counter stats["cell_dropped"].
    join_q_budget: Optional[int] = None
    #: Probe budget of the grid join on the large-nq (> 2048) path:
    #: the 8 corner probes per Q-side pair are compacted to the ones
    #: that hit a non-empty cell before the candidate gather, bounded
    #: by this many (``None`` derives 2 * join_q_budget, scaled by the
    #: probe-window volume under coarse search — ~2x headroom over the
    #: measured ~13% hit rate at fine-delta operating points).
    #: Probes beyond the budget drop their cell, counted in
    #: stats["cell_dropped"]. The small-nq dense path never compacts.
    join_probe_budget: Optional[int] = None
    #: Scale-mode (estimate_scale) Q-sample ceiling. With the distance
    #: filter off, EVERY ordered (i, j) is a pair: the pair space is
    #: nq^2, and a capped *capture* of it covers (capacity / nq^2)^2 of
    #: the (pair1, pair2) joint per trial — measured to fail outright
    #: at nq = 2500 with the 64*nq rowcap capture (see
    #: tests/test_matcher.py::test_scale_mode_q_ceiling). Above 2048
    #: the matcher therefore switches to the "allpairs" implicit-table
    #: engine (zero capture loss; per-base cost grows as nq^2 table
    #: rows through the join sort), and this ceiling bounds that nq^2
    #: growth: Q samples beyond it are truncated (logged; counted in
    #: stats["scale_q_capped"]). Raising it is supported — the cost is
    #: step time (~nq^2), not correctness.
    scale_max_q: int = 2048
    #: Hierarchical scale mode (VERDICT r4 #8): when estimate_scale is
    #: on and sample_size exceeds scale_max_q, solve in two phases
    #: instead of truncating Q to the ceiling — (1) a COARSE similarity
    #: solve at scale_max_q samples recovers the global scale s (the
    #: allpairs engine is exact there: measured 0.08% scale error at
    #: nq=2500, BASELINE.md r3), then (2) a full-resolution RIGID solve
    #: on Q rescaled by s rides the fast distance-banded pipeline
    #: (Pallas capture at any nq) and the composed similarity is
    #: returned. This raises the scale-mode ceiling from ~4k samples
    #: (nq^2 join-table rows per base) to the rigid path's — the nq^2
    #: barrier applies only to the coarse phase, whose sample count is
    #: capped. The residual scale error from phase 1 is absorbed by
    #: delta in phase 2 and re-polished by the final similarity
    #: (Umeyama) refine. False restores the truncate-to-ceiling
    #: behavior (stats["scale_q_capped"]). Reference analog: the
    #: MULTISCALE path is O(n^2) at any n
    #: (ref:algorithms/4pcs.cc:114-198 brute force under MULTISCALE).
    scale_hierarchical: bool = True
    #: Pair-extraction engine: "auto" picks dense masking (nq <= 2048),
    #: row-capped approx-top-k capture (2048 < nq <= 32768), or the
    #: banded sorted-cell-pair-table engine (nq > 32768 — rowcap OOMs
    #: HBM there, measured at nq=65536 on v5 lite; banded work scales
    #: with the output, not nq^2; see ops/band_extract.py, the TPU
    #: re-design of ref:accelerators/pairExtraction/
    #: intersectionFunctor.h:105-233). In estimate_scale mode "auto"
    #: picks dense (nq <= 2048) or "allpairs" — the scale-mode engine
    #: with NO capture at all: the congruent join reads the implicit
    #: full ordered-pair enumeration (see ops/congruent.py
    #: allpairs_cols; requires estimate_scale). Explicit values pin one
    #: engine; batched scan-graph registration (parallel/batch.py)
    #: vmaps one program over per-pair Q arrays, so it cannot use
    #: "banded" (the index is per-cloud) and falls back to
    #: rowcap/dense.
    pair_engine: str = "auto"
    #: Occupied-cell budget of the banded engine's spatial grid (the
    #: cell size doubles from 2 * delta until the count fits; the
    #: sorted table is budget^2 int32 — 256 MB at the default).
    band_cell_budget: int = 8192
    #: Band-window size: table entries the banded engine examines per
    #: base edge (``None`` sizes it so the expected occupancy products
    #: fill band_expand_cap). Under band overflow the window strides
    #: the WHOLE band (rotated per trial); unexamined entries are
    #: counted in stats["pairs_overflow"] in candidate-pair units.
    band_cell_pair_cap: Optional[int] = None
    #: Candidate slots the banded engine's two-level expansion
    #: enumerates per base edge (``None`` = 4x the pair capacity).
    #: Each window entry gets expand_cap / cell_pair_cap slots (sized
    #: ~2x the mean occupancy product, so ~half the slots are real
    #: candidates); real candidates beyond an entry's budget are
    #: counted in stats["pairs_overflow"].
    band_expand_cap: Optional[int] = None
    #: Force the grid-hash congruent join even where the dense K x K
    #: oracle would be chosen (small nq, in-budget mask). The dense
    #: oracle is exact and faster at toy scale, but it bypasses the
    #: per-cell candidate cap entirely — this knob exists so tests and
    #: debugging can exercise the grid path (cell_candidates pressure,
    #: cell_dropped telemetry) at any problem size.
    force_grid_join: bool = False
    #: Direction filter of the Super4PCS congruent join: "cone" (exact
    #: dot-product mask, the default) or "healpix" (rasterized
    #: ring-scheme pixel bins — the reference's deprecated
    #: ``IndexedNormalHealSet``, ref:accelerators/normalHealSet.h:
    #: 102-106, 270-321; deprecated upstream because it "slows down the
    #: approach" — kept as an option for capability parity).
    direction_bins: str = "cone"
    #: HEALPix nside resolution of the "healpix" direction filter
    #: (tolerance is implicit in the pixel size, as in the reference).
    healpix_nside: int = 4
    #: Search-stage tolerance multiplier. The per-trial success rate of
    #: 4PCS RANSAC is gated by whether the sparse Q subsample contains a
    #: 4-point counterpart of the drawn base *within the search
    #: tolerances* — the pair distance band, the congruent-join radius,
    #: and the rms gate (all DISTANCE_FACTOR * delta in the reference,
    #: ref:match4pcsBase.hpp:328-347,439). With a factor f > 1 those
    #: three widen to f * DISTANCE_FACTOR * delta while everything that
    #: defines *quality* — LCP verification and the trimmed-ICP
    #: refinement — stays exact at delta, so a coarsely-located true
    #: base is found in ~f^4 fewer trials and the refinement pulls its
    #: transform to the same final accuracy (the terminate_threshold
    #: stop rule only ever sees exact-at-delta scores). Measured on the
    #: fine-delta 100k benchmark: the unlucky-seed tail collapses
    #: (seed 3: 1856 -> ~32 trials). 1.0 reproduces the reference
    #: contract exactly. Costs wider pair/quad streams per trial —
    #: capacities and overflow telemetry apply unchanged. Designed to
    #: pair with the refinement (``refine_iterations`` > 0, the
    #: default): step winners are selected on the coarse rank metric
    #: and only become the best through the guarded exact-delta refine,
    #: so with refinement disabled a factor > 1 degrades rather than
    #: helps.
    search_delta_factor: float = 1.0
    #: Anytime escalation of the search factor: when the trial estimate
    #: exhausts without reaching ``terminate_threshold`` and enough of
    #: the wall-clock budget remains, the search is rebuilt at this
    #: factor (with a fresh trial estimate) instead of stopping — the
    #: coarse pass catches the unlucky-seed tail that the exact-
    #: tolerance pass missed (measured on the fine-delta 100k
    #: benchmark: the failing seed went from exhausting 144 trials at
    #: LCP 0.45 to 0.99 within the escalated estimate), while lucky
    #: seeds never pay the ~3x coarser step cost. The escalated
    #: program's XLA compile runs on a WORKER THREAD concurrently with
    #: the search (started with the base compile): escalation itself is
    #: a pointer swap, and if the compile is still in flight the loop
    #: keeps searching at the current factor instead of blocking — the
    #: wall-clock budget holds on every seed, cold cache or warm
    #: (stats["escalation_compile_seconds"] is the in-clock cost, 0 by
    #: construction; the concurrent compile time is reported in
    #: stats["escalation_bg_compile_seconds"]). Escalation requires
    #: active refinement (coarse ranking is only recoverable through
    #: the guarded refine — see search_delta_factor) and is skipped in
    #: the last 5% of the wall budget. Values <= the active
    #: search_delta_factor disable escalation.
    search_escalation_factor: float = 2.0
    #: Escalation LADDER depth (VERDICT r4 #5): how many escalation
    #: rungs a run may climb, rung ``s`` searching at
    #: ``search_escalation_factor ** s`` with a fresh trial-estimate
    #: extension each time. The r4 single rung left a failing seed
    #: with no recourse when the escalated estimate also exhausted
    #: below the threshold (nq=32768 seed 1 burned its budget at LCP
    #: 0.653); a second rung (factor 4 by default) makes counterpart
    #: 4-tuples another ~10x more common at ~3x step cost — the right
    #: trade for a run that is otherwise out of options. Every rung
    #: uses the same zero-blocking background-compile machinery; the
    #: wall-clock budget still binds. 1 restores the r4 behavior.
    search_escalation_stages: int = 2
    #: Trimmed-ICP refinement iterations applied to every new best
    #: transform inside the anytime loop and once more after the search
    #: (a quality stage beyond the reference — RANSAC 4-point fits
    #: leave LCP on the table; guarded: the refined pose is kept only
    #: if the exact LCP does not decrease, so results are always
    #: equal-or-better than the reference contract). Because the
    #: ``terminate_threshold`` stop rule sees the refined score, a run
    #: stops as soon as a polished pose clears it instead of grinding
    #: out the full trial estimate. 0 disables.
    refine_iterations: int = 8
    #: Two-stage LCP verification (the batched analog of the reference
    #: Verify's early exit, ref:match4pcsBase.cc:520-558): rank all
    #: candidates on subsampled clouds, exact-score only the top
    #: ``verify_top_k``. 0 disables the coarse stage.
    verify_top_k: int = 2048
    #: Q / P subsample targets of the coarse ranking stage.
    coarse_q: int = 64
    coarse_p: int = 2048
    #: Anytime steps fused into one device dispatch with an in-device
    #: early exit on the terminate threshold (matcher.build_multi_step).
    #: ``None`` auto-selects 8 at nq <= 1024 — the dispatch-bound
    #: regime where a tunneled host<->device round trip (~100 ms)
    #: dwarfs the step's device compute and the unfused anytime loop is
    #: pure latency (the reference's own n=200 demo configs; measured:
    #: hippo time-to-LCP>=0.7 0.675 s unfused vs the serial CPU's
    #: 0.24 s) — and 1 elsewhere. Forced to 1 on sharded runs and at
    #: search_delta_factor != 1. The wall clock is checked between
    #: dispatches; the trial budget still binds per STEP (the dispatch
    #: depth is a traced argument clipped to the remaining estimate).
    #: Contract divergence (documented, pinned by
    #: test_fused_dispatch_visitor_contract): visitor improvement
    #: callbacks coalesce to at most one per dispatch (the host only
    #: observes the carried best at dispatch boundaries), and the
    #: coarse-search rank-redemption path exists only in the per-step
    #: loop — which cannot co-occur, since fused dispatch is forced off
    #: at search_delta_factor != 1. Results are step-loop-identical;
    #: only the progress stream's granularity changes.
    steps_per_dispatch: Optional[int] = None
    #: Pin the sampled-P point count to exactly this value (truncating
    #: by random choice / repeat-padding as needed). P-shape stability
    #: means ONE compiled step program serves clouds of any size — the
    #: lever that makes sequence/merged-set workloads (sequence.py)
    #: avoid a 35-90 s XLA recompile per scan. Repeat-padding is exact
    #: (duplicate P points never change a min-distance); truncation
    #: subsamples P and is only safe when the budget comfortably covers
    #: the overlap region. ``None`` keeps the reference semantics (all
    #: voxel-sampled P points, ref:match4pcsBase.hpp:112-127).
    p_sample_budget: Optional[int] = None
    #: Stop rule. The reference stops when EITHER budget (trial estimate
    #: or wall clock) is exhausted (fraction = max(time, trials) >= 0.99,
    #: ref:match4pcsBase.hpp:239-255) — often leaving most of an
    #: explicit time budget unused once the trial estimate is hit. True
    #: keeps searching until the wall-clock budget or the terminate
    #: threshold is reached (fraction = time only) — recommended for
    #: hard/low-capture configs where the trial estimate undershoots.
    use_full_time_budget: bool = False
    #: Bases-axis sharded runs: all_gather the per-base pair_counts
    #: telemetry table inside the device step (True, the default) or
    #: return it as a sharded output concatenated lazily at host read
    #: time (False). The table is the one step output whose size grows
    #: with bases_per_step x mesh size; everything else is O(1).
    #: Results are bit-identical either way — flip this off if the
    #: in-step collective shows up on real-mesh profiles (overhead on
    #: the 8-device virtual mesh is recorded in BASELINE.md).
    sharded_gather_telemetry: bool = True
    #: Measure a per-phase breakdown of the device step (select/extract,
    #: join, fit, verify) by timing telescoped sub-programs once after
    #: compile — the TPU analog of the reference's TEST_GLOBAL_TIMINGS
    #: table (ref:match4pcsBase.hpp:77-83). Costs a few extra compiles;
    #: results land in stats["phase_seconds"].
    phase_timing: bool = False

    def configure_overlap(self, overlap: float,
                          terminate_threshold: float = 1.0) -> "Options":
        """Validated overlap setter (ref:shared4pcs.h:173-179).

        Returns a new Options; raises ValueError when
        terminate_threshold < overlap, mirroring the reference's
        ``configureOverlap`` returning false.
        """
        if terminate_threshold < overlap:
            raise ValueError(
                f"terminate_threshold ({terminate_threshold}) must be >= "
                f"overlap ({overlap})")
        return dataclasses.replace(
            self, overlap_estimation=float(overlap),
            terminate_threshold=float(terminate_threshold))

    def replace(self, **kw) -> "Options":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        if self.delta <= 0:
            raise ValueError(f"delta must be > 0, got {self.delta}")
        if self.sample_size < 4:
            raise ValueError("sample_size must be >= 4")
        if self.terminate_threshold < self.overlap_estimation:
            raise ValueError(
                "terminate_threshold must be >= overlap_estimation; use "
                "configure_overlap to set both")
        if self.search_delta_factor < 1.0:
            # < 1 would rank candidates tighter than the verification
            # and anneal the refine trim radius upward — outside the
            # design (see the field docstring)
            raise ValueError(
                f"search_delta_factor must be >= 1, got "
                f"{self.search_delta_factor}")
        if self.search_escalation_factor < 0:
            raise ValueError(
                f"search_escalation_factor must be >= 0, got "
                f"{self.search_escalation_factor}")
        if self.search_escalation_stages < 0:
            raise ValueError(
                f"search_escalation_stages must be >= 0, got "
                f"{self.search_escalation_stages}")
        if self.direction_bins not in ("cone", "healpix"):
            raise ValueError(
                f"direction_bins must be 'cone' or 'healpix', got "
                f"{self.direction_bins!r}")
        if self.pair_engine not in ("auto", "dense", "rowcap", "banded",
                                    "allpairs"):
            raise ValueError(
                f"pair_engine must be one of auto/dense/rowcap/banded/"
                f"allpairs, got {self.pair_engine!r}")
        if self.pair_engine == "allpairs" and not self.estimate_scale:
            raise ValueError(
                "pair_engine='allpairs' is the scale-mode engine and "
                "requires estimate_scale=True")
        if self.rowcap_kernel not in ("auto", "xla"):
            raise ValueError(
                f"rowcap_kernel must be 'auto' or 'xla', got "
                f"{self.rowcap_kernel!r}")


# Constants shared with the reference algorithm core.
# ref:src/super4pcs/algorithms/match4pcsBase.h:79-81
K_NUMBER_OF_DIAMETER_TRIALS = 1000
K_LARGE_NUMBER = 1e9
DISTANCE_FACTOR = 2.0
