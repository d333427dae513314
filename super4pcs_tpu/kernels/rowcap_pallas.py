"""Pallas TPU kernel for row-capped pair extraction (the Super4PCS
pair-creation stage, ref:src/super4pcs/pairCreationFunctor.h:120-204).

Why a kernel: the XLA rowcap path funnels every block's masked key
plane through ``jax.lax.approx_max_k`` — a PartialReduce CUSTOM CALL,
whose inputs cannot have fused producers, so the (row_block, n) f32
key plane plus the reduction's s32 iota MATERIALIZE to HBM for every
block of every base edge. Measured via ``compiled.cost_analysis()`` at
nq=32768, b=16: **1.29 TB of HBM traffic per device step** (a 1.6 s
bandwidth floor), ~95% of it these planes — and the telescoped phase
probes mis-attributed it to the join (BASELINE.md r4 roofline: "join
memory-bound at 6% of peak"). This kernel keeps the whole Theta(nq^2)
band evaluation in VMEM/registers and writes ONLY the (n, row_cap)
capture tables: HBM traffic drops ~3 orders of magnitude.

Round-5 extension #1 — fused join hash (VERDICT r5 #1): the congruent
join's dominant cost was measured (tools/join5_micro.py) to be neither
its sort (0.26 s) nor its probe stage but the TABLE HASH build: K1
``pos[cols]`` element gathers plus the invariant-point/cell arithmetic
(2.66 s of the 3.94 s join at nq=32768, b=16 — TPU gathers retire
~1 element per ~9 cycles). At capture time this kernel already holds
BOTH pair endpoints as dense VMEM slab columns, so the edge-0 call
computes ``e1 = a + inv1 * (b - a)``, its grid cell, and the join's
spatial hash in-register (~15 extra VPU ops on an already-resident
tile) and emits an ``h1`` plane alongside ``cols`` — the join then
starts directly at its sort. Empty slots carry the join's sentinel
hash (0x7fffffff) so no XLA fixup pass over the K1 table is needed.

Round-5 extension #2 — in-VMEM pair filters (VERDICT r5 #2): the
reference applies all five pair filters inside extraction at any size
(ref:src/super4pcs/algorithms/pairCreationFunctor.h:151-218); the r4
kernel refused filtered configs, falling back to the 1.29 TB/step XLA
path (OOM above nq=32768). Now the predicates of ops/pairs.py ride
in-kernel:

- normal band: needs the pairwise ``n_i . n_j`` — a second k=8 MXU
  contraction over a normals slab (||n_i -+ n_j||^2 expands to
  n2_i + n2_j -+ 2 n_i.n_j);
- color + translation: SEPARABLE per endpoint. Encoded as one f32
  score per (edge, side, point) computed in XLA (O(nq)):
  fail=-10 / pass-if-both=1 / always-pass=2; the pairwise predicate is
  ``row_score + col_score >= 2`` — exactly the reference's "check only
  when both endpoints have color" escape (see _filter_scores);
- max_angle: the emission-direction angle vs the base segment —
  ``cos = (b.seg - a.seg) / |b - a|``; both dot products are separable
  row/col terms and |b - a| = sqrt(d2) is already computed.

Capture contract (deliberate divergence from the XLA path, documented
in the wrapper): hits are captured per COLUMN SEGMENT with a fixed
per-row quota — ``row_cap`` output slots = (n_pad / COL_TILE) segments
x SEG_Q slots — instead of the XLA path's first-row_cap-in-rotated-
order prefix. A stratified capture spreads a row's capped capture
uniformly over the whole column range (the reference's std::vector
capture is column-ordered too, but unbounded); per-row true counts
``rc`` stay exact, so beyond-quota drops are counted item-exactly,
like every other buffer in this codebase.

Layouts (hard-learned, see CLAUDE.md): Q rides as an (8, n_pad)
transposed slab — (n, 3) would lane-pad 3 -> 128 (a 42x VMEM blowup);
the d2 tile is one k=8 MXU contraction of two slab slices. The slabs
stay PURE (coords in rows 0-2, the rest zero) so the contraction runs
over all 8 sublanes without value slicing; scalar-per-point channels
(segment projection, |n|^2) ride a separate (2, n_pad) aux slab.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1.0e18
_SENT = 2147483647  # join sentinel hash (ops/congruent.py)
# spatial-hash primes — must match ops/congruent.py bit-exactly
_HP1, _HP2, _HP3 = 73856093, 19349669, 83492791
ROW_TILE = 256      # rows per grid step
COL_TILE = 512      # columns per in-kernel loop iteration (= 1 segment)
#: clouds this big keep the (8, n_pad) slab + tiles comfortably in VMEM
MAX_N = 262_144
#: with the normals slab + filter-score planes resident too
MAX_N_FILTERED = 131_072


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def supported(nq: int, filtered: bool = False) -> bool:
    """Kernel path applies: TPU backend and the slab(s) fit VMEM."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    limit = MAX_N_FILTERED if filtered else MAX_N
    return backend in ("tpu", "axon") and nq <= limit


def slots_for(nq: int, target_row_cap: int) -> int:
    """Output slots per row: ``target_row_cap`` rounded UP to a whole
    number of per-segment quota slots (segments = padded-n / COL_TILE).
    The kernel's out block is (seg_q, ROW_TILE) — slots is never a
    block minor dim, so no 128-lane rounding applies. The matcher uses
    this as the effective join row_cap (k1 = n_pad * slots rows)."""
    n_pad = _round_up(nq, 2048)
    segs = n_pad // COL_TILE
    seg_q = max(1, -(-target_row_cap // segs))
    return segs * seg_q


def _kernel(geo_ref, meta_ref, rowb_ref, colb_ref,
            q8t_ref, n8t_ref, aux_ref, rcscore_ref,
            cols_ref, rc_ref, h_ref,
            *, emit_hash: bool, use_normals: bool, use_rowcol: bool,
            use_angle: bool, use_reject: bool):
    """Grid: (n_pad / ROW_TILE, n_pad / COL_TILE) — ONE base edge.

    geo_ref: (1, 8) f32 SMEM — [lo^2, hi^2, invariant, cell,
    pair_normals_angle, normal_thr, cos_max_angle, unused].
    meta_ref: (1, 1) i32 SMEM — the real (unpadded) point count.
    rowb_ref / colb_ref: (n_rt, 4) / (n_ct, 4) f32 SMEM — the FULL
    ROW_TILE / COL_TILE tile bounding-sphere tables [cx, cy, cz, r]
    (empty tiles carry cx=1e18, r=0), indexed by the rt / ct scalars
    (whole-array SMEM blocks: Mosaic rejects (1, 4) sub-blocks — block
    dims must divide (8, 128) or equal the array's; the tables are
    <=4 KB so resident-everywhere is free). Round-5 tile rejection: with
    Morton-ordered inputs (matcher._init) tiles are spatially
    coherent, and the band annulus [lo, hi] is geometrically thin, so
    most (row-tile, col-tile) pairs satisfy min-possible distance
    dc - r1 - r2 > hi or max-possible dc + r1 + r2 < lo and skip the
    whole MXU/mask/scan body (a conservative triangle-inequality
    bound with a small slack against f32 rounding — never rejects a
    tile containing an in-band pair, so per-row counts stay exact).
    q8t_ref: (8, n_pad) f32 VMEM — rows 0-2 coords, rest zero; padded
    columns carry +1e18 in row 0 (band-rejected automatically).
    n8t_ref: (8, n_pad) f32 VMEM — rows 0-2 raw normals, rest zero.
    Dummy (8, 8) when use_normals is False.
    aux_ref: (2, n_pad) f32 VMEM — row 0: pos . seg_dir (use_angle),
    row 1: |n|^2 (use_normals). Dummy (2, 8) when neither.
    rcscore_ref: (2, n_pad) f32 VMEM — row 0: first-endpoint (row)
    score, row 1: second-endpoint (col) score; pair passes iff
    row + col >= 2 (see _filter_scores). Dummy when use_rowcol False.
    cols_ref: (seg_q, ROW_TILE) i32 out block — this column segment's
    captured ids for this row tile, slots in SUBLANES (Mosaic rejects
    dynamic lane-offset stores; the wrapper transposes once in XLA).
    rc_ref: (8, ROW_TILE // 8) i32 out block — exact per-row hit
    counts, accumulated across the ct (minor) grid steps.
    h_ref: (seg_q, ROW_TILE) i32 out block — the captured slot's join
    hash (emit_hash) or a dummy (8, 8) block otherwise.
    """
    rt = pl.program_id(0)
    ct = pl.program_id(1)
    n_real = meta_ref[0, 0]
    lo2 = geo_ref[0, 0]
    hi2 = geo_ref[0, 1]
    seg_q = cols_ref.shape[0]

    # per-row counts accumulate across the ct (minor) grid steps:
    # zero-init must run whether or not this tile pair is rejected
    @pl.when(ct == 0)
    def _():
        rc_ref[:, :] = jnp.zeros_like(rc_ref)

    if use_reject:
        dx = rowb_ref[rt, 0] - colb_ref[ct, 0]
        dy = rowb_ref[rt, 1] - colb_ref[ct, 1]
        dz = rowb_ref[rt, 2] - colb_ref[ct, 2]
        dc = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        rsum = rowb_ref[rt, 3] + colb_ref[ct, 3]
        lo_s = jnp.sqrt(jnp.maximum(lo2, 0.0))
        hi_s = jnp.sqrt(hi2)
        # conservative slack: f32 rounding in dc/r is ~1e-7 relative;
        # 1e-5 relative + tiny absolute can only UNDER-reject
        slack = 1.0e-5 * (hi_s + dc) + 1.0e-12
        reject = ((dc - rsum > hi_s + slack)
                  | (dc + rsum < lo_s - slack))

        @pl.when(reject)
        def _():
            cols_ref[:, :] = jnp.full((seg_q, ROW_TILE), -1, jnp.int32)
            if emit_hash:
                h_ref[:, :] = jnp.full((seg_q, ROW_TILE), _SENT,
                                       jnp.int32)

        compute = jnp.logical_not(reject)
    else:
        compute = ct >= 0   # always true; keeps one code shape

    @pl.when(compute)
    def _capture_tile():
        _kernel_body(geo_ref, n_real, q8t_ref, n8t_ref, aux_ref,
                     rcscore_ref, cols_ref, rc_ref, h_ref, rt, ct,
                     lo2, hi2, seg_q, emit_hash=emit_hash,
                     use_normals=use_normals, use_rowcol=use_rowcol,
                     use_angle=use_angle)


def _kernel_body(geo_ref, n_real, q8t_ref, n8t_ref, aux_ref,
                 rcscore_ref, cols_ref, rc_ref, h_ref, rt, ct,
                 lo2, hi2, seg_q, *, emit_hash: bool,
                 use_normals: bool, use_rowcol: bool, use_angle: bool):
    """The un-rejected tile-pair path: band mask + filters + exact
    per-row counts + stratified capture (see _kernel docstring)."""
    rows = q8t_ref[:, pl.ds(rt * ROW_TILE, ROW_TILE)]      # (8, RT)
    r2 = jnp.sum(rows * rows, axis=0, keepdims=True)       # (1, RT)
    row_ids = (rt * ROW_TILE
               + jax.lax.broadcasted_iota(jnp.int32,
                                          (ROW_TILE, COL_TILE), 0))
    lane = jax.lax.broadcasted_iota(jnp.int32,
                                    (ROW_TILE, COL_TILE), 1)

    cols3 = q8t_ref[:, pl.ds(ct * COL_TILE, COL_TILE)]     # (8, CT)
    c2 = jnp.sum(cols3 * cols3, axis=0, keepdims=True)     # (1, CT)
    # d2 = |u|^2 + |v|^2 - 2 u.v ; one k=8 MXU contraction (the
    # zero-padded coord sublanes contribute 0)
    # precision=HIGHEST: the TPU MXU's default f32 path is bf16-based
    # (~1e-3 relative error) — enough to misclassify band edges vs the
    # exact XLA extractors (CLAUDE.md gotcha; applies inside Pallas too)
    dots = jax.lax.dot_general(
        rows, cols3, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (RT, CT)
    d2 = r2.T + c2 - 2.0 * dots
    j = ct * COL_TILE + lane                               # (RT, CT)
    mask = ((d2 >= lo2) & (d2 <= hi2)
            & (j != row_ids) & (j < n_real)
            & (row_ids < n_real))

    if use_normals:
        # min(| ||ni-nj|| - a |, | ||ni+nj|| - a |) <= thr, skipped
        # when either |n|^2 == 0 (ops/pairs.ordered_pair_mask)
        a_ang = geo_ref[0, 4]
        nthr = geo_ref[0, 5]
        nrows = n8t_ref[:, pl.ds(rt * ROW_TILE, ROW_TILE)]
        ncols = n8t_ref[:, pl.ds(ct * COL_TILE, COL_TILE)]
        ndots = jax.lax.dot_general(
            nrows, ncols,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (RT, CT)
        n2r = aux_ref[1:2, pl.ds(rt * ROW_TILE, ROW_TILE)]  # (1, RT)
        n2c = aux_ref[1:2, pl.ds(ct * COL_TILE, COL_TILE)]  # (1, CT)
        ssum = n2r.T + n2c
        dminus = jnp.sqrt(jnp.maximum(ssum - 2.0 * ndots, 0.0))
        dplus = jnp.sqrt(jnp.maximum(ssum + 2.0 * ndots, 0.0))
        nd = jnp.minimum(jnp.abs(dminus - a_ang),
                         jnp.abs(dplus - a_ang))
        both = (n2r.T > 0) & (n2c > 0)
        # no jnp.where on bools: Mosaic rejects the i8->i1 truncation
        # a scalar-True select lowers to
        mask &= (~both) | (nd <= nthr)

    if use_rowcol:
        # separable color/translation scores: pass iff row + col >= 2
        rs = rcscore_ref[0:1, pl.ds(rt * ROW_TILE, ROW_TILE)]
        cs = rcscore_ref[1:2, pl.ds(ct * COL_TILE, COL_TILE)]
        mask &= (rs.T + cs) >= 2.0

    if use_angle:
        # emission-direction angle vs the base segment:
        # arccos((b - a).seg / |b - a|) <= max_angle, i.e.
        # (b.seg - a.seg) >= cos(max_angle) * |b - a|
        cmax = geo_ref[0, 6]
        aseg = aux_ref[0:1, pl.ds(rt * ROW_TILE, ROW_TILE)]
        bseg = aux_ref[0:1, pl.ds(ct * COL_TILE, COL_TILE)]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        mask &= (bseg - aseg.T) >= cmax * dist

    rc_ref[:, :] = rc_ref[:, :] + jnp.sum(
        mask, axis=1, dtype=jnp.int32).reshape(8, ROW_TILE // 8)

    # exclusive in-segment rank; first seg_q hits win their slot. At
    # most one lane per (row, k) satisfies rank == k, so the masked
    # lane-reduction of (j + 1) recovers its column id (0 -> empty ->
    # -1) without any per-lane scatter. (cumsum has no Pallas TPU
    # lowering: Hillis-Steele lane scan — log2(COL_TILE) roll+add
    # passes, wrapped lanes masked off.)
    s = mask.astype(jnp.int32)
    shift = 1
    while shift < COL_TILE:
        rolled = pltpu.roll(s, shift, axis=1)
        s = s + jnp.where(lane < shift, 0, rolled)
        shift *= 2
    prefix = s - mask.astype(jnp.int32)

    if emit_hash:
        # the join's table hash, computed while both endpoints are
        # VMEM-resident: e1 = a + inv * (b - a) per coord (identical
        # arithmetic to ops/congruent._e1_components), cell floor, and
        # the _HP spatial hash. int32 multiply wraps two's-complement
        # exactly as the XLA path does.
        inv = geo_ref[0, 2]
        cell = geo_ref[0, 3]
        h = None
        for c, hp in enumerate((_HP1, _HP2, _HP3)):
            ac = rows[c:c + 1, :]                          # (1, RT)
            bc = cols3[c:c + 1, :]                         # (1, CT)
            e1 = ac.T + inv * (bc - ac.T)                  # (RT, CT)
            hc = jnp.floor(e1 / cell).astype(jnp.int32) * hp
            h = hc if h is None else h ^ hc
        hv = []
        sent = jnp.int32(_SENT)
        for k in range(seg_q):
            sel = mask & (prefix == k)
            # single-lane masked sum; empty slots recover the sentinel
            # (wrapping int32 add: h - SENT + SENT == h)
            hv.append(jnp.sum(jnp.where(sel, h - sent, 0),
                              axis=1, dtype=jnp.int32) + sent)
        h_ref[:, :] = jnp.stack(hv, axis=0)                # (seg_q, RT)

    vals = []
    for k in range(seg_q):
        sel = mask & (prefix == k)
        vals.append(jnp.sum(jnp.where(sel, j + 1, 0),
                            axis=1, dtype=jnp.int32) - 1)  # (RT,)
    cols_ref[:, :] = jnp.stack(vals, axis=0)               # (seg_q, RT)


def _tile_bounds(pos, n_pad: int, tile: int):
    """(n_pad/tile, 4) f32 [cx, cy, cz, r] bounding spheres of each
    ``tile``-point slab of the PADDED layout (real points only; empty
    tiles carry cx=1e18, r=0 so any real tile rejects against them)."""
    n = pos.shape[0]
    nt = n_pad // tile
    pp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(pos)
    rm = (jnp.arange(n_pad) < n).reshape(nt, tile)
    p3 = pp.reshape(nt, tile, 3)
    cnt = jnp.sum(rm, axis=1)
    c = (jnp.sum(p3 * rm[..., None], axis=1)
         / jnp.maximum(cnt, 1)[:, None])
    d = jnp.linalg.norm(p3 - c[:, None, :], axis=-1) * rm
    r = jnp.max(d, axis=1)
    c = jnp.where(cnt[:, None] > 0, c, jnp.float32(1.0e18))
    r = jnp.where(cnt > 0, r, 0.0)
    return jnp.concatenate([c, r[:, None]], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("row_cap", "n_real", "emit_hash", "use_normals",
                     "use_rowcol", "use_angle", "use_reject",
                     "interpret"))
def _capture_edge(q8t, n8t, aux, rcscore, geo, rowb, colb, *,
                  row_cap: int,
                  n_real: int, emit_hash: bool = False,
                  use_normals: bool = False, use_rowcol: bool = False,
                  use_angle: bool = False, use_reject: bool = False,
                  interpret: bool = False):
    """One edge's stratified band capture. Returns (cols (n_pad,
    row_cap) i32, rc (n_pad,) i32[, h (n_pad, row_cap) i32])."""
    n_pad = q8t.shape[1]
    n_rt = n_pad // ROW_TILE
    n_ct = n_pad // COL_TILE
    seg_q = row_cap // n_ct
    grid = (n_rt, n_ct)
    meta = jnp.full((1, 1), n_real, jnp.int32)
    kern = functools.partial(
        _kernel, emit_hash=emit_hash, use_normals=use_normals,
        use_rowcol=use_rowcol, use_angle=use_angle,
        use_reject=use_reject)

    def full(a):
        return pl.BlockSpec(a.shape, lambda r, c: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((None, None, seg_q, ROW_TILE),
                     lambda r, c: (r, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 8, ROW_TILE // 8),
                     lambda r, c: (r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_rt, n_ct, seg_q, ROW_TILE), jnp.int32),
        jax.ShapeDtypeStruct((n_rt, 8, ROW_TILE // 8), jnp.int32),
    ]
    if emit_hash:
        out_specs.append(
            pl.BlockSpec((None, None, seg_q, ROW_TILE),
                         lambda r, c: (r, c, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_rt, n_ct, seg_q, ROW_TILE),
                                 jnp.int32))
    else:
        # dummy block: written by nobody, shaped to one tile
        out_specs.append(pl.BlockSpec((8, 8), lambda r, c: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, 8), jnp.int32))
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            # full tile-bounds tables in SMEM (<=4 KB): scalar reads at
            # [rt]/[ct] drive the reject predicate before any VMEM work
            pl.BlockSpec(rowb.shape, lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(colb.shape, lambda r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            full(q8t), full(n8t), full(aux), full(rcscore),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(geo, meta, rowb, colb, q8t, n8t, aux, rcscore)
    cols4, rc = outs[0], outs[1]
    # slot-major per-row layout for the join (trow = slot // row_cap):
    # (rt, ct, k, r) -> (rt, r, ct, k) -> (n_pad, row_cap)
    cols = cols4.transpose(0, 3, 1, 2).reshape(n_pad, row_cap)
    rc = rc.reshape(n_pad)
    if emit_hash:
        h = outs[2].transpose(0, 3, 1, 2).reshape(n_pad, row_cap)
        return cols, rc, h
    return cols, rc


def _filter_scores(pos, rgb, base_pos, base_rgb, e0, e1,
                   max_color_distance, max_translation_distance):
    """Separable color/translation endpoint scores (2, n) f32: row 0
    scores the pair's FIRST endpoint vs base point ``e0``, row 1 the
    SECOND vs ``e1``. The pairwise predicate ``row + col >= 2``
    reproduces ops/pairs.ordered_pair_mask exactly:

    - translation fail  -> -10 (sinks any partner)
    - color pass / no-rgb escape -> 2 (always passes the sum)
    - color checked-and-good     -> 1 (passes iff partner >= 1)
    - color checked-and-bad      -> 0 (fails unless partner escapes)

    The reference checks color only when BOTH endpoints (and the base)
    carry color (ref:4pcs.cc:161-171, pairCreationFunctor.h:182-200):
    an endpoint without color scores 2, so its partner's verdict alone
    decides — (0-score partner) + 2 = 2 passes, matching the
    "where(use_rgb, good, True)" escape of the dense path.
    """
    scores = []
    for b in (e0, e1):
        s = jnp.full(pos.shape[0], 2.0, jnp.float32)
        if max_color_distance > 0:
            has = rgb[:, 0] >= 0
            base_has = (base_rgb[e0][0] >= 0) & (base_rgb[e1][0] >= 0)
            good = (jnp.linalg.norm(rgb - base_rgb[b], axis=-1)
                    < max_color_distance)
            s = jnp.where(base_has & has,
                          jnp.where(good, 1.0, 0.0), 2.0)
        if max_translation_distance > 0:
            far = (jnp.linalg.norm(pos - base_pos[b], axis=-1)
                   >= max_translation_distance)
            s = jnp.where(far, -10.0, s)
        scores.append(s)
    return jnp.stack(scores)                               # (2, n)


def extract_pairs_rowcap_pallas_both(
    pos, base_pos,
    pair_distance_epsilon,
    row_cap: int,
    interpret: bool = False,
    invariant1=None,
    cell_size: float | None = None,
    normal=None, rgb=None, base_norm=None, base_rgb=None,
    max_normal_difference: float = -1.0,
    max_color_distance: float = -1.0,
    max_translation_distance: float = -1.0,
    max_angle: float = -1.0,
    tile_reject: bool = True,
):
    """Both base edges' band captures (two kernel launches, one per
    edge — the edge-0 launch optionally fuses the join hash).

    Same return contract as
    :func:`ops.pairs.extract_pairs_rowcap_layout_both` — per edge
    ``(pairs (n_pad * row_cap, 2), valid, count, dropped)`` with slot
    ``s`` holding ordered pair ``(s // row_cap, cols[s])`` — except
    the capture rule is segment-stratified (module docstring).
    ``row_cap`` must equal :func:`slots_for`'s rounding.

    When ``invariant1``/``cell_size`` are given, returns a third
    element: the (n_pad * row_cap,) int32 join-hash table for edge
    (0, 1) — captured slots carry the spatial hash of their invariant
    point's cell (identical arithmetic to ops/congruent.py), empty
    slots the join sentinel. Pass it to
    ``find_congruent_quads_grid(table_hash=...)``.

    The normal/color/translation/angle filters (off at their -1.0
    defaults) apply the reference's per-pair predicates in-VMEM — see
    the module docstring and ops/pairs.ordered_pair_mask for the exact
    contracts (parity pinned by tests/test_rowcap_pallas.py).

    pos: (n, 3) centered Q samples. base_pos: (4, 3) — edges (0, 1)
    and (2, 3). Distance band: squared-vs-squared around each edge's
    length (ref:pairCreationFunctor.h:151-160 via ops/pairs).
    """
    n = pos.shape[0]
    n_pad = _round_up(n, 2048)
    assert row_cap == slots_for(n, row_cap), \
        "row_cap must be pre-rounded via slots_for()"
    use_normals = max_normal_difference > 0
    use_rowcol = max_color_distance > 0 or max_translation_distance > 0
    use_angle = max_angle > 0
    emit_hash = invariant1 is not None

    q8t = jnp.zeros((8, n_pad), jnp.float32)
    q8t = q8t.at[:3, :n].set(pos.T)
    if n_pad > n:
        q8t = q8t.at[0, n:].set(_PAD)

    # tile bounding spheres for the in-kernel band rejection (pays off
    # when the caller Morton-orders ``pos`` — matcher._init does; on
    # unsorted inputs rejection simply never fires). Pure functions of
    # ``pos``: XLA CSEs them across the vmapped bases of a device step.
    rowb = _tile_bounds(pos, n_pad, ROW_TILE)
    colb = _tile_bounds(pos, n_pad, COL_TILE)

    eps = jnp.float32(pair_distance_epsilon)
    d01 = jnp.linalg.norm(base_pos[0] - base_pos[1])
    d23 = jnp.linalg.norm(base_pos[2] - base_pos[3])
    dists = jnp.stack([d01, d23])
    lo = jnp.maximum(dists - eps, 0.0)
    hi = dists + eps

    dummy2 = jnp.zeros((2, 8), jnp.float32)
    n8t = jnp.zeros((8, 8), jnp.float32)
    aux_base = dummy2
    if use_normals:
        n8t = jnp.zeros((8, n_pad), jnp.float32)
        n8t = n8t.at[:3, :n].set(normal.T)
        nang = jnp.stack([
            jnp.linalg.norm(base_norm[0] - base_norm[1]),
            jnp.linalg.norm(base_norm[2] - base_norm[3])])
        nthr = jnp.float32(0.5 * max_normal_difference * math.pi / 180.0)
    else:
        nang = jnp.zeros(2, jnp.float32)
        nthr = jnp.float32(0.0)
    if use_normals or use_angle:
        aux_base = jnp.zeros((2, n_pad), jnp.float32)
        if use_normals:
            aux_base = aux_base.at[1, :n].set(
                jnp.sum(normal * normal, axis=-1))

    cmax = (jnp.float32(math.cos(max_angle * math.pi / 180.0))
            if use_angle else jnp.float32(0.0))

    results = []
    h1 = None
    for e, (e0, e1) in enumerate(((0, 1), (2, 3))):
        aux = aux_base
        if use_angle:
            seg = base_pos[e1] - base_pos[e0]
            seg = seg / jnp.maximum(jnp.linalg.norm(seg), 1e-30)
            aux = aux.at[0, :n].set(pos @ seg)
        rcscore = dummy2
        if use_rowcol:
            sc = _filter_scores(pos, rgb, base_pos, base_rgb, e0, e1,
                                max_color_distance,
                                max_translation_distance)
            rcscore = jnp.zeros((2, n_pad), jnp.float32)
            rcscore = rcscore.at[:, :n].set(sc)
        geo = jnp.stack([
            lo[e] * lo[e], hi[e] * hi[e],
            (jnp.asarray(invariant1, jnp.float32)
             if emit_hash and e == 0 else jnp.float32(0.0)),
            (jnp.float32(cell_size) if emit_hash and e == 0
             else jnp.float32(1.0)),
            nang[e], nthr, cmax, jnp.float32(0.0)]).reshape(1, 8)
        out = _capture_edge(
            q8t, n8t, aux, rcscore, geo, rowb, colb,
            row_cap=row_cap, n_real=n,
            emit_hash=emit_hash and e == 0, use_normals=use_normals,
            use_rowcol=use_rowcol, use_angle=use_angle,
            use_reject=tile_reject, interpret=interpret)
        cols, rc = out[0], out[1]
        if emit_hash and e == 0:
            h1 = out[2].reshape(-1)
        # COLS-ONLY table: slot s is the ordered pair (s // row_cap,
        # cols[s]). The packed (K1, 2) pairs tensor was the join's real
        # HBM wall after the capture planes were gone (~1.6 TB/step at
        # nq=32768 through the stack + its fused consumers); the join
        # accepts the 1-D form directly.
        ce = cols.reshape(-1)
        valid = ce >= 0
        count = jnp.sum(rc, dtype=jnp.int32)
        found = jnp.sum(valid, dtype=jnp.int32)
        results.append((jnp.maximum(ce, 0), valid, count,
                        count - found))
    if emit_hash:
        return tuple(results) + (h1,)
    return tuple(results)
