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
the d2 tile is one k=8 MXU contraction of two slab slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1.0e18
ROW_TILE = 256      # rows per grid step
COL_TILE = 512      # columns per in-kernel loop iteration (= 1 segment)
#: clouds this big keep the (8, n_pad) slab + tiles comfortably in VMEM
MAX_N = 262_144


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def supported(nq: int) -> bool:
    """Kernel path applies: TPU backend and the slab fits VMEM."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend in ("tpu", "axon") and nq <= MAX_N


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


def _kernel(bands_ref, meta_ref, q8t_ref, cols_ref, rc_ref):
    """Grid: (2 edges, n_pad / ROW_TILE, n_pad / COL_TILE).

    bands_ref: (2, 2) f32 SMEM — per-edge [lo^2, hi^2] of the distance
    band (squared-vs-squared, see ops/pairs.pair_block_geometry).
    meta_ref: (1, 1) i32 SMEM — the real (unpadded) point count.
    q8t_ref: (8, n_pad) f32 VMEM — rows 0-2 coords, 3-7 zero; padded
    columns carry +1e18 in row 0 (band-rejected automatically).
    cols_ref: (seg_q, ROW_TILE) i32 out block — this column segment's
    captured ids for this row tile, slots in SUBLANES (Mosaic rejects
    dynamic lane-offset stores; the wrapper transposes once in XLA).
    rc_ref: (8, ROW_TILE // 8) i32 out block — exact per-row hit
    counts, accumulated across the ct (minor) grid steps.
    """
    e = pl.program_id(0)
    rt = pl.program_id(1)
    ct = pl.program_id(2)
    n_real = meta_ref[0, 0]
    lo2 = bands_ref[e, 0]
    hi2 = bands_ref[e, 1]
    seg_q = cols_ref.shape[0]

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
    dots = jax.lax.dot_general(
        rows, cols3, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (RT, CT)
    d2 = r2.T + c2 - 2.0 * dots
    j = ct * COL_TILE + lane                               # (RT, CT)
    mask = ((d2 >= lo2) & (d2 <= hi2)
            & (j != row_ids) & (j < n_real)
            & (row_ids < n_real))

    @pl.when(ct == 0)
    def _():
        rc_ref[:, :] = jnp.zeros_like(rc_ref)

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
    vals = []
    for k in range(seg_q):
        sel = mask & (prefix == k)
        vals.append(jnp.sum(jnp.where(sel, j + 1, 0),
                            axis=1, dtype=jnp.int32) - 1)  # (RT,)
    cols_ref[:, :] = jnp.stack(vals, axis=0)               # (seg_q, RT)


@functools.partial(
    jax.jit,
    static_argnames=("row_cap", "n_real", "interpret"))
def _capture(q8t, bands, *, row_cap: int, n_real: int,
             interpret: bool = False):
    n_pad = q8t.shape[1]
    n_rt = n_pad // ROW_TILE
    n_ct = n_pad // COL_TILE
    seg_q = row_cap // n_ct
    grid = (2, n_rt, n_ct)
    meta = jnp.full((1, 1), n_real, jnp.int32)
    cols5, rc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 2), lambda e, r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda e, r, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_pad), lambda e, r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, None, seg_q, ROW_TILE),
                         lambda e, r, c: (e, r, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 8, ROW_TILE // 8),
                         lambda e, r, c: (e, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, n_rt, n_ct, seg_q, ROW_TILE),
                                 jnp.int32),
            jax.ShapeDtypeStruct((2, n_rt, 8, ROW_TILE // 8),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(bands, meta, q8t)
    # slot-major per-row layout for the join (trow = slot // row_cap):
    # (e, rt, ct, k, r) -> (e, rt, r, ct, k) -> (e, n_pad, row_cap)
    cols = cols5.transpose(0, 1, 4, 2, 3).reshape(2, n_pad, row_cap)
    return cols, rc.reshape(2, n_pad)


def extract_pairs_rowcap_pallas_both(
    pos, base_pos,
    pair_distance_epsilon,
    row_cap: int,
    interpret: bool = False,
):
    """Both base edges' band captures in one kernel launch.

    Same return contract as
    :func:`ops.pairs.extract_pairs_rowcap_layout_both` — per edge
    ``(pairs (n_pad * row_cap, 2), valid, count, dropped)`` with slot
    ``s`` holding ordered pair ``(s // row_cap, cols[s])`` — except the
    capture rule is segment-stratified (module docstring) and the
    normal/color/translation filters are NOT applied (callers gate on
    an unfiltered config; the matcher falls back to the XLA path
    otherwise). ``row_cap`` must equal :func:`slots_for`'s rounding.

    pos: (n, 3) centered Q samples. base_pos: (4, 3) — edges (0, 1)
    and (2, 3). Distance band: squared-vs-squared around each edge's
    length (ref:pairCreationFunctor.h:151-160 via ops/pairs).
    """
    n = pos.shape[0]
    n_pad = _round_up(n, 2048)
    assert row_cap == slots_for(n, row_cap), \
        "row_cap must be pre-rounded via slots_for()"
    q8t = jnp.zeros((8, n_pad), jnp.float32)
    q8t = q8t.at[:3, :n].set(pos.T)
    if n_pad > n:
        q8t = q8t.at[0, n:].set(_PAD)

    eps = jnp.float32(pair_distance_epsilon)
    d01 = jnp.linalg.norm(base_pos[0] - base_pos[1])
    d23 = jnp.linalg.norm(base_pos[2] - base_pos[3])
    lo = jnp.maximum(jnp.stack([d01, d23]) - eps, 0.0)
    hi = jnp.stack([d01, d23]) + eps
    bands = jnp.stack([lo * lo, hi * hi], axis=1)          # (2, 2)

    cols, rc = _capture(q8t, bands, row_cap=row_cap, n_real=n,
                        interpret=interpret)

    # COLS-ONLY table: slot s is the ordered pair (s // row_cap,
    # cols[s]). The packed (K1, 2) pairs tensor was the join's real
    # HBM wall after the capture planes were gone (~1.6 TB/step at
    # nq=32768 through the stack + its fused consumers); the join
    # accepts the 1-D form directly.
    results = []
    for e in range(2):
        ce = cols[e].reshape(-1)
        valid = ce >= 0
        count = jnp.sum(rc[e], dtype=jnp.int32)
        found = jnp.sum(valid, dtype=jnp.int32)
        results.append((jnp.maximum(ce, 0), valid, count,
                        count - found))
    return tuple(results)
