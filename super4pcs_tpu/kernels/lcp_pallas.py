"""Pallas TPU kernels for the LCP min-distance core.

The hot op of the whole framework (the reference's ``Verify`` kd-tree
walk, ref:src/super4pcs/algorithms/match4pcsBase.cc:504-567): for every
candidate transform and query point, the squared distance to the
nearest P point.

Design notes:
- the distance matrix is a K=3 contraction — on the 128x128 MXU that
  runs at 3/128 utilization and the |a|^2+|b|^2-2ab expansion it needs
  loses ~1e-7 absolute to cancellation. The d2 blocks are therefore
  computed on the VPU as exact f32 coordinate-wise (a-b)^2 sums;
- the candidate transform is applied *inside* the kernel: each
  candidate carries one homogeneous 8x8 matrix A with A[:3,:3] = R^T
  and A[3,:3] = t, so tq = q8 @ A for q8 rows (x, y, z, 1, 0...). This
  keeps the (C, Nq, 3) transformed cloud out of HBM entirely — XLA
  would pad its 3-lane minor dim to 128 (a 42x memory blowup that OOMs
  at C=2k, Nq=8k);
- Q and P live in VMEM for the whole program; the (Q_TILE, P_TILE) d2
  block never leaves VMEM.

Outputs are (C, Nq) min squared distances; the LCP threshold/mean runs
in XLA. Padded P columns carry a +1e18 sentinel so they never win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1.0e18
Q_TILE = 512       # query rows per inner iteration
P_TILE = 1024      # P columns per inner iteration
M_TILE = 512       # rows per grid step of the raw-rows kernel

# VMEM guard: p8t is ~32 B/point plus the d2 block and q slab.
MAX_P_VMEM = 300_000
MAX_Q_VMEM = 65_536


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _p8t_of(p_pos: jnp.ndarray, np_pad: int) -> jnp.ndarray:
    """(8, np_pad) transposed, zero coord-padded, sentinel col-padded."""
    n = p_pos.shape[0]
    p8t = jnp.zeros((8, np_pad), jnp.float32)
    p8t = p8t.at[:3, :n].set(p_pos.T)
    if np_pad > n:
        p8t = p8t.at[0, n:].set(_PAD)
    return p8t


def _min_d2_block(tq_ref_or_arr, p_ref, pi):
    sl = pl.ds(pi * P_TILE, P_TILE)
    t = tq_ref_or_arr
    d2 = (t[:, 0:1] - p_ref[0:1, sl]) ** 2
    d2 += (t[:, 1:2] - p_ref[1:2, sl]) ** 2
    d2 += (t[:, 2:3] - p_ref[2:3, sl]) ** 2
    return jnp.min(d2, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# candidate-transform kernel: out[c, q] = min_p || A_c q - p ||^2
# ---------------------------------------------------------------------------

C_TILE = 8         # candidates per grid step (sublane-divisible output)


def _lcp_min_kernel(a_ref, q_ref, p_ref, out_ref, *, n_qtiles, n_ptiles,
                    q_tile):
    for ci in range(C_TILE):
        a = a_ref[ci]                              # (8, 8)

        def q_body(qi, _, a=a, ci=ci):
            qsl = pl.ds(qi * q_tile, q_tile)
            tq = jnp.dot(q_ref[qsl, :], a,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (QT, 8)

            def p_body(pi, m):
                return jnp.minimum(m, _min_d2_block(tq, p_ref, pi))

            m = jax.lax.fori_loop(
                0, n_ptiles, p_body,
                jnp.full((q_tile, 1), jnp.inf, dtype=jnp.float32))
            out_ref[ci, qsl] = m[:, 0]
            return 0

        jax.lax.fori_loop(0, n_qtiles, q_body, 0)


def _q_tile_of(nq: int) -> int:
    """Adaptive query tile: full Q_TILE when Q fills it, else the
    sublane-rounded Q size — small (e.g. coarse-verification) Q slabs
    waste neither compute nor output lanes."""
    return Q_TILE if nq >= Q_TILE else _round_up(max(nq, 8), 8)


def candidate_min_sq_dists(transforms, q_pos, p_pos):
    """(C, Nq) exact min squared distances of every transformed query to
    the P cloud — transforms applied in-kernel.

    This is the ONLY memory-safe layout at large C: any flattened
    (C * Nq, 8) HBM staging of transformed queries is padded by XLA to
    128 lanes — a 16x blowup that measured 2 x 7.9 GB (OOM) at the
    258k-candidate coarse-verification stage of a 500-sample run. Here
    transformed queries exist only as (q_tile, 8) VMEM blocks."""
    c = transforms.shape[0]
    c_pad = _round_up(max(c, C_TILE), C_TILE)
    nq = q_pos.shape[0]
    qt = _q_tile_of(nq)
    nq_pad = _round_up(max(nq, 8), qt)
    np_pad = _round_up(max(p_pos.shape[0], 128), P_TILE)

    # homogeneous 8x8: rows of q8 are (x, y, z, 1, 0, 0, 0, 0)
    a = jnp.zeros((c_pad, 8, 8), jnp.float32)
    a = a.at[:c, :3, :3].set(jnp.swapaxes(transforms[:, :3, :3], 1, 2))
    a = a.at[:c, 3, :3].set(transforms[:, :3, 3])

    q8 = jnp.zeros((nq_pad, 8), jnp.float32)
    q8 = q8.at[:nq, :3].set(q_pos)
    q8 = q8.at[:, 3].set(1.0)
    p8t = _p8t_of(p_pos, np_pad)

    out = pl.pallas_call(
        functools.partial(_lcp_min_kernel,
                          n_qtiles=nq_pad // qt,
                          n_ptiles=np_pad // P_TILE,
                          q_tile=qt),
        grid=(c_pad // C_TILE,),
        in_specs=[
            pl.BlockSpec((C_TILE, 8, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C_TILE, nq_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_pad, nq_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * c_pad * nq_pad * np_pad, transcendentals=0,
            bytes_accessed=c_pad * 256 + nq_pad * 32 + np_pad * 32
            + c_pad * nq_pad * 4),
    )(a, q8, p8t)
    return out[:c, :nq]


def lcp_scores_pallas(transforms, q_pos, p_pos, epsilon):
    """Drop-in for ops.lcp.lcp_scores on TPU: (C,) LCP fractions.

    Always the in-kernel-transform path (adaptive q tile): a flattened
    (C * Nq, 8) staging array was tried for small Q and OOMs at large C
    from XLA's 8 -> 128 lane padding (see candidate_min_sq_dists)."""
    d2 = candidate_min_sq_dists(transforms, q_pos, p_pos)
    eps2 = jnp.asarray(epsilon, jnp.float32) ** 2
    from ..ops.lcp import _masked_lcp_mean
    return _masked_lcp_mean(d2 <= eps2, q_pos)


def supported(p_count: int, q_count: int = 0) -> bool:
    """Whether the kernel path applies (TPU backend, clouds fit VMEM)."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return (backend in ("tpu", "axon") and p_count <= MAX_P_VMEM
            and q_count <= MAX_Q_VMEM)


# ---------------------------------------------------------------------------
# raw-rows kernel: out[m] = min_p || tq[m] - p ||^2 (no transform)
# ---------------------------------------------------------------------------

def _min_dist_kernel(tq_ref, p_ref, out_ref, *, n_ptiles):
    def body(pi, acc):
        return jnp.minimum(acc, _min_d2_block(tq_ref[:, :], p_ref, pi))

    init = jnp.full((tq_ref.shape[0], 1), jnp.inf, dtype=jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, n_ptiles, body, init)


def min_sq_dists(tq: jnp.ndarray, p_pos: jnp.ndarray) -> jnp.ndarray:
    """(M,) exact min squared distance from each row of ``tq`` (M, 3)
    to the cloud ``p_pos`` (Np, 3)."""
    m = tq.shape[0]
    m_pad = _round_up(max(m, 8), M_TILE)
    np_pad = _round_up(max(p_pos.shape[0], 128), P_TILE)

    tq8 = jnp.zeros((m_pad, 8), jnp.float32).at[:m, :3].set(tq)
    p8t = _p8t_of(p_pos, np_pad)

    out = pl.pallas_call(
        functools.partial(_min_dist_kernel, n_ptiles=np_pad // P_TILE),
        grid=(m_pad // M_TILE,),
        in_specs=[
            pl.BlockSpec((M_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * m_pad * np_pad, transcendentals=0,
            bytes_accessed=m_pad * 32 + np_pad * 32 + m_pad * 4),
    )(tq8, p8t)
    return out[:m, 0]


# ---------------------------------------------------------------------------
# streamed-P kernel: P larger than VMEM, tiled through the Pallas pipeline
# ---------------------------------------------------------------------------

MAX_P_STREAM = 4_000_000


def _min_dist_stream_kernel(tq_ref, p_ref, out_ref):
    """2-D grid (m tiles x p tiles, p fastest): each step min-reduces one
    (M_TILE, P_TILE) d2 block into the revisited output block. Pallas
    pipelines the P-tile DMAs; consecutive p steps share the out block
    so accumulation is safe."""
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        out_ref[:, :] = jnp.full(out_ref.shape, jnp.inf, jnp.float32)

    t = tq_ref[:, :]
    d2 = (t[:, 0:1] - p_ref[0:1, :]) ** 2
    d2 += (t[:, 1:2] - p_ref[1:2, :]) ** 2
    d2 += (t[:, 2:3] - p_ref[2:3, :]) ** 2
    out_ref[:, :] = jnp.minimum(
        out_ref[:, :], jnp.min(d2, axis=1, keepdims=True))


def min_sq_dists_streamed(tq: jnp.ndarray, p_pos: jnp.ndarray):
    """Like :func:`min_sq_dists` but P is streamed tile-by-tile through
    the Pallas pipeline instead of living in VMEM — P up to millions of
    points. P traffic is one full pass per M_TILE rows of tq."""
    m = tq.shape[0]
    np_pad = _round_up(max(p_pos.shape[0], 128), P_TILE)
    p8t = _p8t_of(p_pos, np_pad)
    m_pad = _round_up(max(m, 8), M_TILE)
    tq8 = jnp.zeros((m_pad, 8), jnp.float32).at[:m, :3].set(tq)

    out = pl.pallas_call(
        _min_dist_stream_kernel,
        grid=(m_pad // M_TILE, np_pad // P_TILE),
        in_specs=[
            pl.BlockSpec((M_TILE, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M_TILE, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * m_pad * np_pad, transcendentals=0,
            bytes_accessed=(m_pad // M_TILE) * np_pad * 32
            + m_pad * 32 + m_pad * 4),
    )(tq8, p8t)
    return out[:m, 0]


def _lcp_min_stream_kernel(a_ref, q_ref, p_ref, out_ref, *, n_qtiles,
                           q_tile):
    """2-D grid (c tiles x p tiles, p fastest): transforms applied
    in-kernel (same layout rationale as candidate_min_sq_dists),
    min-reducing each (q_tile, P_TILE) d2 block into the revisited
    (C_TILE, nq_pad) output block. The per-p-step re-application of the
    8x8 transform matmul is noise next to the d2 block work."""
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        out_ref[:, :] = jnp.full(out_ref.shape, jnp.inf, jnp.float32)

    for ci in range(C_TILE):
        a = a_ref[ci]

        def q_body(qi, _, a=a, ci=ci):
            qsl = pl.ds(qi * q_tile, q_tile)
            tq = jnp.dot(q_ref[qsl, :], a,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            d2 = (tq[:, 0:1] - p_ref[0:1, :]) ** 2
            d2 += (tq[:, 1:2] - p_ref[1:2, :]) ** 2
            d2 += (tq[:, 2:3] - p_ref[2:3, :]) ** 2
            m = jnp.min(d2, axis=1)
            out_ref[ci, qsl] = jnp.minimum(out_ref[ci, qsl], m)
            return 0

        jax.lax.fori_loop(0, n_qtiles, q_body, 0)


def candidate_min_sq_dists_streamed(transforms, q_pos, p_pos):
    """(C, Nq) min squared distances with P streamed tile-by-tile
    through the Pallas pipeline (P beyond VMEM residency, up to
    millions of points); Q stays VMEM-resident (<= MAX_Q_VMEM)."""
    c = transforms.shape[0]
    c_pad = _round_up(max(c, C_TILE), C_TILE)
    nq = q_pos.shape[0]
    qt = _q_tile_of(nq)
    nq_pad = _round_up(max(nq, 8), qt)
    np_pad = _round_up(max(p_pos.shape[0], 128), P_TILE)

    a = jnp.zeros((c_pad, 8, 8), jnp.float32)
    a = a.at[:c, :3, :3].set(jnp.swapaxes(transforms[:, :3, :3], 1, 2))
    a = a.at[:c, 3, :3].set(transforms[:, :3, 3])
    q8 = jnp.zeros((nq_pad, 8), jnp.float32)
    q8 = q8.at[:nq, :3].set(q_pos)
    q8 = q8.at[:, 3].set(1.0)
    p8t = _p8t_of(p_pos, np_pad)

    out = pl.pallas_call(
        functools.partial(_lcp_min_stream_kernel,
                          n_qtiles=nq_pad // qt, q_tile=qt),
        grid=(c_pad // C_TILE, np_pad // P_TILE),
        in_specs=[
            pl.BlockSpec((C_TILE, 8, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq_pad, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C_TILE, nq_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_pad, nq_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * c_pad * nq_pad * np_pad, transcendentals=0,
            bytes_accessed=(c_pad // C_TILE) * np_pad * 32
            + c_pad * 256 + nq_pad * 32 + c_pad * nq_pad * 4),
    )(a, q8, p8t)
    return out[:c, :nq]


def lcp_scores_pallas_streamed(transforms, q_pos, p_pos, epsilon):
    """LCP fractions with P streamed (P beyond the VMEM-resident cap)."""
    d2 = candidate_min_sq_dists_streamed(transforms, q_pos, p_pos)
    eps2 = jnp.asarray(epsilon, jnp.float32) ** 2
    from ..ops.lcp import _masked_lcp_mean
    return _masked_lcp_mean(d2 <= eps2, q_pos)
