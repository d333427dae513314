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

Unit-cube normalization (ref:pairCreationFunctor.h:90-122) is
deliberately NOT reproduced. The reference rescales Q into [0,1]^3
solely to condition its rasterization grid (fixed-epsilon quantization
needs unit-range coordinates). Here every predicate is evaluated on raw
(centroid-centered, ref:hpp:141-149) f32 coordinates and the only
quantized structure — the congruent join's spatial hash — uses
``floor(e / cell)`` with cell proportional to delta, which is scale-free
by construction. Precision analysis: pair distances lose accuracy
relative to delta only when extent/delta approaches 2^24 (f32 mantissa),
orders of magnitude beyond any configuration the sampler can resolve
(delta is also the sampling voxel size, bounding extent/delta by
~sample_size^(1/3) per axis of occupied cells). Pinned by
tests/test_matcher.py::test_large_coordinate_extent_robustness (offset
1e5, extent 1e3).
"""

from __future__ import annotations

import dataclasses
import math

import jax
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
    """Dense (n, n) emission mask: ``emit[u, v]`` means the ordered pair
    (first=u, second=v) is produced.

    Every filter is evaluated in ordered form — first vs base endpoint
    0, second vs endpoint 1, emission direction second-minus-first. The
    reference instead checks colors/translation in one orientation only
    and then emits *both* orders (ref:4pcs.cc:161-196) — a quirk not
    reproduced: a pair whose attributes only match the reversed
    orientation would pair base points with mismatched attributes."""
    return ordered_pair_mask(
        pos, normal, rgb, pos, normal, rgb,
        base_p0_pos, base_p1_pos, base_p0_norm, base_p1_norm,
        base_p0_rgb, base_p1_rgb,
        pair_distance, pair_normals_angle, pair_distance_epsilon,
        cfg, u_offset=0)


def extract_pairs(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,   # (4,3) each, the current base
    edge0: int, edge1: int,          # static: (0,1) or (2,3)
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    capacity: int,
    row_offset=None,
):
    """Extract ordered pairs matching one base edge, compacted to a
    static buffer.

    Returns (pairs (capacity, 2) int32, valid (capacity,), count,
    dropped). ``count`` is the exact number of pairs pre-cap and
    ``dropped`` the exact number of emissions missing from the buffer —
    the "never silently truncate without counting" invariant.

    ``row_offset`` (traced scalar) rotates the capture preference: the
    compaction keeps hits in row-major order starting at row
    ``row_offset`` (wrapping). Matters only under overflow — without it
    the surviving prefix is the SAME low-index rows every trial, so a
    true pair outside it is lost for the whole run (the dense-path
    analog of extract_pairs_rowcap's col_offset; essential in
    estimate_scale mode where every (i, j) is a hit).
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
    if row_offset is not None:
        off = jnp.mod(jnp.asarray(row_offset, jnp.int32), n)
        emit = jnp.roll(emit, -off, axis=0)
    flat_idx, valid, count = masked_indices(emit.reshape(-1), capacity)
    u = flat_idx // n
    if row_offset is not None:
        u = jnp.mod(u + off, n)
    pairs = jnp.stack([u, flat_idx % n], axis=-1)
    dropped = jnp.maximum(count - capacity, 0)
    return pairs.astype(jnp.int32), valid, count, dropped


def extract_pairs_dense_rowcap(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    edge0: int, edge1: int,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    capacity: int,
    row_offset=None,
):
    """Dense-mask extraction with a GATHER-FREE per-row capture.

    Same filters and inputs as :func:`extract_pairs`, but the
    compaction is per-row: each row keeps its first
    ``row_cap = capacity // n`` hits in column order, recovered by the
    masked-reduction trick (exclusive in-row prefix sum; at most one
    column satisfies ``prefix == k``, so ``sum(where(...)) - 1`` yields
    its id) — all elementwise/reduction VPU work, zero gathers and
    zero scatters. The global masked_indices compaction it replaces
    ran ``capacity * log2(n^2)`` serial gather rounds per base edge —
    measured as the dominant share of the toy-scale step's
    select_extract phase (0.123 s of hippo's 0.245 s step, r5).

    Capture-rule divergence from :func:`extract_pairs` (documented,
    like the Pallas kernel's segment-stratified rule): overflow drops
    the TAIL OF EACH ROW instead of the global row-major suffix —
    row-fair, matching the reference's per-point pair vectors
    (ref:pairCreationFunctor.h:120-129). Drops stay item-exact.

    ``row_offset`` rotates the first-point axis as in
    :func:`extract_pairs` (the scale-mode capture lottery).

    Returns (pairs (n * row_cap, 2) int32, valid, count, dropped) —
    note the buffer length is ``n * row_cap`` (<= capacity), not
    ``capacity``.
    """
    n = pos.shape[0]
    row_cap = max(capacity // n, 1)
    b0p, b1p = base_pos[edge0], base_pos[edge1]
    pair_distance = jnp.linalg.norm(b0p - b1p)
    pair_normals_angle = jnp.linalg.norm(
        base_norm[edge0] - base_norm[edge1])

    emit = pair_emit_masks(
        pos, normal, rgb,
        b0p, b1p, base_norm[edge0], base_norm[edge1],
        base_rgb[edge0], base_rgb[edge1],
        pair_distance, pair_normals_angle, pair_distance_epsilon, cfg)
    if row_offset is not None:
        off = jnp.mod(jnp.asarray(row_offset, jnp.int32), n)
        emit = jnp.roll(emit, -off, axis=0)

    s = jnp.cumsum(emit, axis=1, dtype=jnp.int32)
    prefix = s - emit                                      # exclusive
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    cols = []
    for k in range(row_cap):
        sel = emit & (prefix == k)
        cols.append(jnp.sum(jnp.where(sel, col + 1, 0),
                            axis=1, dtype=jnp.int32) - 1)  # (n,)
    cols = jnp.stack(cols, axis=1).reshape(-1)             # (n*row_cap,)
    valid = cols >= 0
    u = jnp.arange(n * row_cap, dtype=jnp.int32) // row_cap
    if row_offset is not None:
        u = jnp.mod(u + off, n)
    pairs = jnp.stack([jnp.where(valid, u, 0),
                       jnp.maximum(cols, 0)], axis=-1)
    count = jnp.sum(emit, dtype=jnp.int32)
    found = jnp.sum(valid, dtype=jnp.int32)
    return pairs.astype(jnp.int32), valid, count, count - found


def pair_block_geometry(pos_u, pos, need_dirs: bool):
    """Base-independent distance tensors of one row block, shared by
    every base edge evaluated on it. Returns ``(diff, dist, d2)`` with
    exactly one representation populated:

    - ``need_dirs`` (emission-direction filter on): the (bu, n, 3)
      difference tensor and its norm — the direction filter needs them
      anyway;
    - otherwise: the squared-distance matrix via the
      |q_u|^2 + |q_v|^2 - 2 q_u.q_v expansion — no 3-wide broadcast, no
      sqrt. f32 cancellation is harmless here: the band edge is 2*d*eps
      wide in d^2 units while the rounding error is ~1e-7 * extent^2,
      orders below it for any extent/delta the sampler can resolve (see
      module docstring; pinned by
      test_large_coordinate_extent_robustness).
    """
    if need_dirs:
        diff = pos[None, :, :] - pos_u[:, None, :]   # [u, v] = q_v - q_u
        dist = jnp.linalg.norm(diff, axis=-1)
        return diff, dist, None
    d2 = (jnp.sum(pos_u * pos_u, -1)[:, None]
          + jnp.sum(pos * pos, -1)[None, :]
          - 2.0 * jnp.einsum('ud,vd->uv', pos_u, pos,
                             precision='highest'))
    return None, None, d2


def ordered_pair_mask(
    pos_u, normal_u, rgb_u,        # (bu, 3) row slice (the 'first' point)
    pos, normal, rgb,              # (n, 3) all points (the 'second')
    base_p0_pos, base_p1_pos,
    base_p0_norm, base_p1_norm,
    base_p0_rgb, base_p1_rgb,
    pair_distance, pair_normals_angle, pair_distance_epsilon,
    cfg: PairFilterConfig,
    u_offset,
    geom=None,
):
    """Ordered-pair predicate on a row block: mask[u, v] == True iff the
    ordered pair (first = u_offset+u, second = v) passes every filter.

    Same semantics as :func:`pair_emit_masks` (which evaluates the upper
    triangle and mirrors) expressed directly in ordered form, so large
    clouds can be scanned block-by-block with O(block * n) memory.

    ``geom``: optional precomputed :func:`pair_block_geometry` result —
    the O(block * n) distance tensors are base-independent, so callers
    evaluating several base edges on one block (the two edges of a 4PCS
    base) share them instead of recomputing per edge.
    """
    bu = pos_u.shape[0]
    n = pos.shape[0]
    need_dirs = cfg.max_angle > 0
    if geom is None:
        geom = pair_block_geometry(pos_u, pos, need_dirs)
    diff, dist, d2 = geom

    u_ids = u_offset + jnp.arange(bu, dtype=jnp.int32)
    mask = u_ids[:, None] != jnp.arange(n, dtype=jnp.int32)[None, :]
    if cfg.use_distance_filter:
        if need_dirs:
            mask &= jnp.abs(dist - pair_distance) <= pair_distance_epsilon
        else:
            lo = jnp.maximum(pair_distance - pair_distance_epsilon, 0.0)
            hi = pair_distance + pair_distance_epsilon
            mask &= (d2 >= lo * lo) & (d2 <= hi * hi)

    if cfg.max_normal_difference > 0:
        nsq_u = jnp.sum(normal_u * normal_u, axis=-1)
        nsq = jnp.sum(normal * normal, axis=-1)
        both = (nsq_u[:, None] > 0) & (nsq[None, :] > 0)
        first_ang = jnp.linalg.norm(
            normal_u[:, None, :] - normal[None, :, :], axis=-1)
        second_ang = jnp.linalg.norm(
            normal_u[:, None, :] + normal[None, :, :], axis=-1)
        ndist = jnp.minimum(jnp.abs(first_ang - pair_normals_angle),
                            jnp.abs(second_ang - pair_normals_angle))
        thr = 0.5 * cfg.max_normal_difference * math.pi / 180.0
        mask &= jnp.where(both, ndist <= thr, True)

    if cfg.max_color_distance > 0:
        has_u = rgb_u[:, 0] >= 0
        has = rgb[:, 0] >= 0
        base_has = (base_p0_rgb[0] >= 0) & (base_p1_rgb[0] >= 0)
        use_rgb = has_u[:, None] & has[None, :] & base_has
        dp = jnp.linalg.norm(rgb_u - base_p0_rgb, axis=-1)  # first vs b0
        dq = jnp.linalg.norm(rgb - base_p1_rgb, axis=-1)    # second vs b1
        good = (dp[:, None] < cfg.max_color_distance) & \
               (dq[None, :] < cfg.max_color_distance)
        mask &= jnp.where(use_rgb, good, True)

    if cfg.max_translation_distance > 0:
        tp = jnp.linalg.norm(pos_u - base_p0_pos, axis=-1)
        tq = jnp.linalg.norm(pos - base_p1_pos, axis=-1)
        mask &= (tp[:, None] < cfg.max_translation_distance) & \
                (tq[None, :] < cfg.max_translation_distance)

    if cfg.max_angle > 0:
        seg1 = base_p1_pos - base_p0_pos
        seg1 = seg1 / jnp.linalg.norm(seg1)
        cosang = jnp.clip(jnp.sum(
            diff / jnp.maximum(dist, 1e-30)[..., None] * seg1, axis=-1),
            -1.0, 1.0)
        mask &= jnp.arccos(cosang) <= cfg.max_angle * math.pi / 180.0

    return mask


def extract_pairs_blocked(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    edge0: int, edge1: int,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    capacity: int,
    block: int = 512,
):
    """Large-cloud form of :func:`extract_pairs`: evaluates the
    ordered-pair predicate in row blocks so memory stays O(block * n),
    compacts hits per block into local buffers (vmapped — a scatter
    threaded through a scan carry serializes on TPU, ~50x slower), then
    merges the per-block buffers with one small global compaction.
    Same outputs as the dense form.

    The TPU equivalent, at scale, of the reference's sphere
    rasterization engine (ref:accelerators/pairExtraction/
    intersectionFunctor.h) — the FLOPs stay dense (VPU-friendly) while
    the n x n mask never materializes.
    """
    n = pos.shape[0]
    b0p, b1p = base_pos[edge0], base_pos[edge1]
    pair_distance = jnp.linalg.norm(b0p - b1p)
    pair_normals_angle = jnp.linalg.norm(base_norm[edge0] - base_norm[edge1])

    n_pad = ((n + block - 1) // block) * block
    pad = n_pad - n
    # pad rows with a far sentinel so they never pass the filters
    pos_p = jnp.concatenate(
        [pos, jnp.full((pad, 3), 1e18, pos.dtype)]) if pad else pos
    norm_p = jnp.concatenate(
        [normal, jnp.zeros((pad, 3), normal.dtype)]) if pad else normal
    rgb_p = jnp.concatenate(
        [rgb, jnp.full((pad, 3), -1.0, rgb.dtype)]) if pad else rgb
    n_blocks = n_pad // block

    # per-block capacity: hits are ~uniform over row blocks; 4x headroom,
    # overflow still counted exactly via the block hit counts
    local_cap = min(block * n,
                    max(-(-capacity // n_blocks) * 4, 1024))

    def one_block(_, blk_idx):
        r0 = blk_idx * block
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, block)
        mask = ordered_pair_mask(
            sl(pos_p), sl(norm_p), sl(rgb_p), pos, normal, rgb,
            b0p, b1p, base_norm[edge0], base_norm[edge1],
            base_rgb[edge0], base_rgb[edge1],
            pair_distance, pair_normals_angle, pair_distance_epsilon,
            cfg, u_offset=r0)
        # padded rows must never emit (the sentinel only guards
        # distance-filtered configs)
        row_ids = r0 + jnp.arange(block, dtype=jnp.int32)
        mask &= (row_ids < n)[:, None]
        idx, valid, cnt = masked_indices(mask.reshape(-1), local_cap)
        # block-local flat index -> global (u, v)
        u = r0 + idx // n
        v = idx % n
        return 0, (u, v, valid, cnt)

    # scan (sequential) keeps one block's mask live at a time; the
    # compacted per-block outputs come back as stacked scan ys, so no
    # buffer is threaded through the carry (a carried scatter
    # serializes on TPU)
    _, (us, vs, valids, counts) = jax.lax.scan(
        one_block, 0, jnp.arange(n_blocks, dtype=jnp.int32))

    # merge: block-major order == row-major order of the dense form
    sel, valid, _ = masked_indices(valids.reshape(-1), capacity)
    pairs = jnp.stack([us.reshape(-1)[sel], vs.reshape(-1)[sel]], axis=-1)
    count = jnp.sum(counts, dtype=jnp.int32)
    # exact drop accounting at both truncation points: a block whose
    # hits exceed local_cap (hits concentrated in one row block) drops
    # even when the global total stays under capacity, and the merge
    # drops whatever the captured union exceeds capacity by
    captured = jnp.sum(jnp.minimum(counts, local_cap), dtype=jnp.int32)
    blk_dropped = count - captured
    merge_dropped = jnp.maximum(captured - capacity, 0)
    return pairs.astype(jnp.int32), valid, count, blk_dropped + merge_dropped


def extract_pairs_rowcap(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    edge0: int, edge1: int,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    capacity: int,
    row_cap: int | None = None,
    row_block: int = 2048,
    recall_target: float = 0.95,
    col_offset=None,
):
    """Large-nq pair extraction via per-row capped top-k compaction.

    The production fast path for nq > 2048 (the role of the reference's
    sphere-rasterization smart indexing, ref:accelerators/pairExtraction/
    intersectionFunctor.h:105-233). The mask predicate is cheap on the
    VPU (~2 ms/base at nq=8192); what dominated the previous designs was
    *compaction* — a 67M-element prefix sum + binary search per base
    (~200 ms/base/edge in ``extract_pairs_blocked``). Here each row
    keeps its first ``row_cap`` hits via ``lax.approx_max_k`` over
    masked column keys (the TPU-optimized partial reduction; on CPU it
    lowers to exact top_k), and one small merge compacts the
    (nq, row_cap) survivors — ~10x faster (196 ms for 16 bases at
    nq=8192 vs 3.5 s blocked).

    Capping semantics: a row with more than ``row_cap`` hits drops its
    tail (spread fairly across rows, unlike the global-prefix cap, which
    starves high row indices), and ``approx_max_k`` at the default
    recall target may miss ~0.1% of hits at TPU sizes; both losses are
    counted exactly in ``dropped`` — the "never silently truncate
    without counting" invariant. Same return contract as
    :func:`extract_pairs`.

    ``col_offset`` (traced scalar) rotates the per-row keep preference:
    a row keeps its first ``row_cap`` hits in column order starting at
    ``col_offset`` (wrapping). Passing a per-base random offset
    decorrelates the capture lottery across RANSAC trials — without it
    every base keeps the same low-column subset, so a true pair outside
    it is lost for the whole run.
    """
    n = pos.shape[0]
    if row_cap is None:
        # ~2.5x the mean captured-per-row budget: wide enough that rows
        # rarely clip before the global capacity does (measured best
        # quality-per-second at nq=8192, capacity=64*nq)
        row_cap = min(n, max(32, _round_up_32(
            5 * capacity // (2 * max(n, 1)))))
    cols, hit, rc, n_pad = _rowcap_scan(
        pos, normal, rgb, base_pos, base_norm, base_rgb, edge0, edge1,
        pair_distance_epsilon, cfg, row_cap, row_block, recall_target,
        col_offset)

    # Merge exploiting approx_max_k's output layout: each row's hits
    # occupy its FIRST cap_r slots (finite keys sort before -inf), so
    # global compaction is pure index arithmetic — row offsets from an
    # n_pad-element cumsum, slot->row by binary search over that small
    # table. Replaces a (n_pad*row_cap)-element cumsum+scatter
    # (masked_indices) that dominated extraction time; outputs are
    # bit-identical (row-major, within-row approx_max_k order).
    cap_r = jnp.sum(hit, axis=1, dtype=jnp.int32)          # (n_pad,)
    off_incl = jnp.cumsum(cap_r, dtype=jnp.int32)
    found = off_incl[-1]
    s = jnp.arange(capacity, dtype=jnp.int32)
    valid = s < jnp.minimum(found, capacity)
    # slot -> row: scatter each non-empty row's index at its start
    # offset, then a running max fills the gaps. (A binary search per
    # slot — searchsorted method='scan' — is 13 serial gather rounds on
    # TPU and measured 4x slower than the whole old scatter merge.)
    off_excl = off_incl - cap_r
    rows = jnp.arange(n_pad, dtype=jnp.int32)
    tgt = jnp.where((cap_r > 0) & (off_excl < capacity), off_excl,
                    capacity)
    starts = jnp.zeros(capacity + 1, jnp.int32).at[tgt].max(
        rows, mode="drop")
    r = jax.lax.cummax(starts[:capacity])
    r = jnp.where(valid, r, 0)
    j = s - off_excl[r]
    j = jnp.where(valid, j, 0)
    v = cols[r, j]
    pairs = jnp.stack([jnp.where(valid, r, 0), jnp.where(valid, v, 0)],
                      axis=-1)

    count = jnp.sum(rc, dtype=jnp.int32)          # exact pre-cap total
    captured = jnp.minimum(found, capacity)
    return pairs.astype(jnp.int32), valid, count, count - captured


def _rowcap_scan(pos, normal, rgb, base_pos, base_norm, base_rgb,
                 edge0, edge1, pair_distance_epsilon, cfg,
                 row_cap, row_block, recall_target, col_offset):
    """Shared block scan of the row-capped extraction: per-row masked
    approx_max_k capture. Returns (cols (n_pad, row_cap), hit
    (n_pad, row_cap), rc (n_pad,) exact per-row mask counts, n_pad)."""
    (out,), n_pad = _rowcap_scan_edges(
        pos, normal, rgb, base_pos, base_norm, base_rgb,
        [(edge0, edge1)], pair_distance_epsilon, cfg,
        row_cap, row_block, recall_target, col_offset)
    return (*out, n_pad)


def _rowcap_scan_edges(pos, normal, rgb, base_pos, base_norm, base_rgb,
                       edges, pair_distance_epsilon, cfg,
                       row_cap, row_block, recall_target, col_offset):
    """Block scan of the row-capped extraction over one or more base
    edges at once. The O(row_block * n) distance geometry is computed
    once per block and shared by every edge's mask
    (:func:`pair_block_geometry`), and all edges' keys go through ONE
    approx_max_k call — per-row results are identical to running the
    edges separately (the reduction is row-independent).

    Returns ([(cols (n_pad, row_cap), hit, rc), ...] per edge, n_pad).
    """
    n = pos.shape[0]
    need_dirs = cfg.max_angle > 0
    edge_params = []
    for (e0, e1) in edges:
        b0p, b1p = base_pos[e0], base_pos[e1]
        edge_params.append((
            e0, e1, b0p, b1p,
            jnp.linalg.norm(b0p - b1p),
            jnp.linalg.norm(base_norm[e0] - base_norm[e1])))

    n_pad = ((n + row_block - 1) // row_block) * row_block
    pad = n_pad - n
    pos_p = jnp.concatenate(
        [pos, jnp.full((pad, 3), 1e18, pos.dtype)]) if pad else pos
    norm_p = jnp.concatenate(
        [normal, jnp.zeros((pad, 3), normal.dtype)]) if pad else normal
    rgb_p = jnp.concatenate(
        [rgb, jnp.full((pad, 3), -1.0, rgb.dtype)]) if pad else rgb
    n_blocks = n_pad // row_block
    col = jnp.arange(n, dtype=jnp.int32)
    if col_offset is not None:
        rank = jnp.mod(col - jnp.asarray(col_offset, jnp.int32), n)
    else:
        rank = col
    neg_rank = -rank.astype(jnp.float32)

    def one_block(_, blk_idx):
        r0 = blk_idx * row_block
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, row_block)
        pos_b, norm_b, rgb_b = sl(pos_p), sl(norm_p), sl(rgb_p)
        geom = pair_block_geometry(pos_b, pos, need_dirs)
        row_ids = r0 + jnp.arange(row_block, dtype=jnp.int32)
        row_live = (row_ids < n)[:, None]
        keys = []
        rcs = []
        for (e0, e1, b0p, b1p, pdist, pnang) in edge_params:
            mask = ordered_pair_mask(
                pos_b, norm_b, rgb_b, pos, normal, rgb,
                b0p, b1p, base_norm[e0], base_norm[e1],
                base_rgb[e0], base_rgb[e1],
                pdist, pnang, pair_distance_epsilon,
                cfg, u_offset=r0, geom=geom)
            mask &= row_live
            # first row_cap hit columns per row (in rotated rank
            # order): approx_max_k over -rank keys (descending values
            # == ascending ranks)
            keys.append(jnp.where(mask, neg_rank[None, :], -jnp.inf))
            rcs.append(jnp.sum(mask, axis=1, dtype=jnp.int32))
        # ONE approx_max_k per edge, NOT one call over a concatenated
        # key tensor: the concatenate materializes every block's
        # (ne*row_block, n) f32 key plane (plus the reduction's iota)
        # to HBM — measured via cost_analysis at nq=32768, b=16: the
        # production step moved 1.29 TB/step, ~95% of it these planes,
        # and the telescoped probes mis-attributed it to the join.
        # Per-edge calls keep each plane fused into its own
        # PartialReduce (the where() producer is elementwise), so only
        # the (row_block, row_cap) outputs ever touch HBM. Per-row
        # results are identical (the reduction is row-independent).
        vc = [jax.lax.approx_max_k(k, row_cap,
                                   recall_target=recall_target)
              for k in keys]
        vals = jnp.concatenate([v for (v, _) in vc], axis=0)
        cols = jnp.concatenate([c for (_, c) in vc], axis=0)
        return 0, (cols.astype(jnp.int32), vals > -jnp.inf,
                   jnp.stack(rcs))

    _, (cols, hit, rc) = jax.lax.scan(
        one_block, 0, jnp.arange(n_blocks, dtype=jnp.int32))
    # un-interleave: scan stacked each block's (n_edges*row_block, cap)
    ne = len(edges)
    cols = cols.reshape(n_blocks, ne, row_block, row_cap)
    hit = hit.reshape(n_blocks, ne, row_block, row_cap)
    rc = rc.reshape(n_blocks, ne, row_block)
    outs = []
    for e in range(ne):
        outs.append((cols[:, e].reshape(n_pad, row_cap),
                     hit[:, e].reshape(n_pad, row_cap),
                     rc[:, e].reshape(n_pad)))
    return outs, n_pad


def extract_pairs_rowcap_layout(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    edge0: int, edge1: int,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    row_cap: int,
    row_block: int = 2048,
    recall_target: float = 0.9,
    col_offset=None,
):
    """Row-capped extraction WITHOUT the global compaction.

    Returns the raw per-row capture layout: ``(pairs (n_pad*row_cap, 2),
    valid (n_pad*row_cap,), count, dropped)`` where slot ``s`` holds the
    ordered pair ``(s // row_cap, cols[s])``. Compared to
    :func:`extract_pairs_rowcap` this removes both the merge compaction
    cost and the global ``capacity`` truncation entirely — the only
    losses are per-row caps and approx_max_k recall misses, exactly
    counted in ``dropped``. The congruent join consumes (pairs, valid)
    of any length, so the fixed-capacity buffer stage is unnecessary on
    the large-nq path (its role in the reference — bounding memory of a
    std::vector — is played by row_cap here;
    ref:accelerators/pairExtraction/intersectionFunctor.h:105-233).
    """
    n = pos.shape[0]
    cols, hit, rc, n_pad = _rowcap_scan(
        pos, normal, rgb, base_pos, base_norm, base_rgb, edge0, edge1,
        pair_distance_epsilon, cfg, row_cap, row_block, recall_target,
        col_offset)
    u = jnp.arange(n_pad * row_cap, dtype=jnp.int32) // row_cap
    pairs = jnp.stack([u, cols.reshape(-1)], axis=-1)
    valid = hit.reshape(-1)
    count = jnp.sum(rc, dtype=jnp.int32)
    found = jnp.sum(hit, dtype=jnp.int32)
    return pairs, valid, count, count - found


def extract_pairs_rowcap_layout_both(
    pos, normal, rgb,
    base_pos, base_norm, base_rgb,
    pair_distance_epsilon,
    cfg: PairFilterConfig,
    row_cap: int,
    row_block: int = 2048,
    recall_target: float = 0.9,
    col_offset=None,
    cols_only: bool = False,
):
    """Both base edges' row-capped extractions in one fused block scan.

    Outputs are identical to calling :func:`extract_pairs_rowcap_layout`
    with edges (0, 1) and (2, 3) separately (pinned by a parity test),
    but the O(row_block * n) distance geometry is computed once per
    block instead of twice — the extraction phase of a device step does
    half the work. Returns ((pairs, valid, count, dropped) for edge
    (0, 1), same for edge (2, 3)).

    ``cols_only``: return the 1-D cols table instead of packed (K1, 2)
    pairs — slot s is (s // row_cap, cols[s]); the join consumes this
    form directly, and skipping the pack avoids a K1 x 2 materialized
    tensor chain per base (the production step's default).
    """
    outs, n_pad = _rowcap_scan_edges(
        pos, normal, rgb, base_pos, base_norm, base_rgb,
        [(0, 1), (2, 3)], pair_distance_epsilon, cfg,
        row_cap, row_block, recall_target, col_offset)
    if not cols_only:
        u = jnp.arange(n_pad * row_cap, dtype=jnp.int32) // row_cap
    results = []
    for cols, hit, rc in outs:
        flat = cols.reshape(-1)
        table = flat if cols_only else jnp.stack([u, flat], axis=-1)
        valid = hit.reshape(-1)
        count = jnp.sum(rc, dtype=jnp.int32)
        found = jnp.sum(hit, dtype=jnp.int32)
        results.append((table, valid, count, count - found))
    return tuple(results)


def _round_up_32(x: int) -> int:
    return ((x + 31) // 32) * 32
