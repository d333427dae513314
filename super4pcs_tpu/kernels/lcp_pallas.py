"""Pallas TPU kernel for the LCP min-distance core.

The hot op of the whole framework (the reference's ``Verify`` kd-tree
walk, ref:src/super4pcs/algorithms/match4pcsBase.cc:504-567): for every
transformed query row, the squared distance to its nearest P point.

Design notes (why not the MXU):
- the distance matrix is a K=3 contraction — on the 128x128 systolic
  array that runs at 3/128 utilization, and the |a|^2+|b|^2-2ab
  expansion it requires loses ~1e-7 absolute to cancellation;
- the XLA fallback (ops/lcp.py) therefore pays for an HBM round-trip of
  the (C*Nq, Np) cross matrix plus an argmin + exact-recompute pass;
- here the whole thing is one VPU program: P lives in VMEM transposed
  as (8, Np), each grid step streams an (M_TILE, 8) slab of transformed
  queries, and d2 is accumulated coordinate-wise as exact f32
  (a-b)^2 sums — no expansion, no cancellation, no second pass, and the
  (M_TILE, P_TILE) distance block never leaves VMEM.

Coordinates are padded 3 -> 8 with zeros (sublane multiple); padded P
rows carry a +1e18 sentinel so they never win the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 1.0e18
M_TILE = 512       # query rows per grid step
P_TILE = 2048      # P columns per inner iteration

# VMEM guard: p8t is 32 B/point; leave room for the d2 block + slabs.
MAX_P_VMEM = 300_000


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _min_dist_kernel(tq_ref, p_ref, out_ref, *, n_ptiles):
    """out[m] = min_j sum_k (tq[m,k] - p[k,j])^2  (exact f32, VPU)."""

    def body(i, acc):
        sl = pl.ds(i * P_TILE, P_TILE)
        d2 = (tq_ref[:, 0:1] - p_ref[0:1, sl]) ** 2
        d2 += (tq_ref[:, 1:2] - p_ref[1:2, sl]) ** 2
        d2 += (tq_ref[:, 2:3] - p_ref[2:3, sl]) ** 2
        return jnp.minimum(acc, jnp.min(d2, axis=1, keepdims=True))

    init = jnp.full((tq_ref.shape[0], 1), jnp.inf, dtype=jnp.float32)
    out_ref[:, :] = jax.lax.fori_loop(0, n_ptiles, body, init)


def min_sq_dists(tq: jnp.ndarray, p_pos: jnp.ndarray) -> jnp.ndarray:
    """(M,) exact min squared distance from each row of ``tq`` (M, 3)
    to the cloud ``p_pos`` (Np, 3)."""
    m = tq.shape[0]
    m_pad = _round_up(max(m, 8), M_TILE)
    np_pad = _round_up(max(p_pos.shape[0], 128), P_TILE)

    tq8 = jnp.zeros((m_pad, 8), jnp.float32).at[:m, :3].set(tq)
    p8t = jnp.full((8, np_pad), 0.0, jnp.float32)
    p8t = p8t.at[3:, :].set(0.0)
    p8t = p8t.at[:3, :p_pos.shape[0]].set(p_pos.T)
    # sentinel: padded P columns sit at +1e18 on the first coordinate
    if np_pad > p_pos.shape[0]:
        p8t = p8t.at[0, p_pos.shape[0]:].set(_PAD)

    n_ptiles = np_pad // P_TILE
    grid = (m_pad // M_TILE,)

    out = pl.pallas_call(
        functools.partial(_min_dist_kernel, n_ptiles=n_ptiles),
        grid=grid,
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


def supported(p_count: int) -> bool:
    """Whether the kernel path applies (TPU backend, P fits VMEM)."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend in ("tpu", "axon") and p_count <= MAX_P_VMEM


def lcp_scores_pallas(transforms, q_pos, p_pos, epsilon):
    """Drop-in for ops.lcp.lcp_scores on TPU: (C,) LCP fractions."""
    c = transforms.shape[0]
    nq = q_pos.shape[0]
    rot = transforms[:, :3, :3]
    trans = transforms[:, :3, 3]
    tq = jnp.einsum('cij,nj->cni', rot, q_pos,
                    precision=jax.lax.Precision.HIGHEST) + trans[:, None]
    d2 = min_sq_dists(tq.reshape(c * nq, 3), p_pos).reshape(c, nq)
    eps2 = jnp.asarray(epsilon, jnp.float32) ** 2
    return jnp.mean(d2 <= eps2, axis=-1)
