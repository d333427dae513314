"""LCP (Largest Common Pointset) verification.

TPU-native replacement for ``Match4PCSBase::Verify``
(ref:src/super4pcs/algorithms/match4pcsBase.cc:504-567): the reference
walks a kd-tree once per transformed Q point with an early exit guarded
by the shared best LCP; here *all* candidate transforms of a device step
are scored in one batched, tiled min-distance program:

    lcp(c) = (1/|Q|) * #{ i : min_j || T_c q_i - p_j ||^2 <= delta^2 }

The cross term rides the MXU via the ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b
expansion; P is processed in blocks with a running minimum so the full
C x |Q| x |P| distance tensor never materializes. A Pallas kernel
version lives in ``super4pcs_tpu.kernels.lcp_pallas``; this XLA fallback
is the oracle (exact same math) and the CPU-test path.

No early exit is needed: the batched argmax over candidates replaces the
reference's shared-mutable ``best_LCP_`` + ``omp critical`` pattern
(ref:match4pcsBase.hpp:467-484).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Padding sentinel: far enough that padded P points never win the min,
# small enough that |pad|^2 stays finite in float32.
_PAD = 1.0e18


def _pad_rows(x, multiple, value):
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = jnp.full((rem,) + x.shape[1:], value, dtype=x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return x


def lcp_scores(transforms, q_pos, p_pos, epsilon,
               p_block: int = 2048, elem_budget: int = 32 * 1024 * 1024):
    """LCP fraction for each candidate transform.

    Args:
      transforms: (C, 4, 4) rigid transforms (centered-Q -> centered-P).
      q_pos: (Nq, 3) centered Q samples.
      p_pos: (Np, 3) centered P samples.
      epsilon: LCP distance threshold (options.delta, ref:cc:517).
      p_block: P tile length for the running-min scan.
      elem_budget: cap on live d^2 elements per block (memory control).

    Returns:
      (C,) float32 LCP fractions in [0, 1].
    """
    c = transforms.shape[0]
    nq = q_pos.shape[0]

    p_pad = _pad_rows(p_pos, p_block, _PAD)
    n_pblocks = p_pad.shape[0] // p_block
    p_blocks = p_pad.reshape(n_pblocks, p_block, 3)
    p_sq = jnp.sum(p_blocks * p_blocks, axis=-1)          # (B, pb)

    cand_chunk = max(1, min(c, elem_budget // max(1, nq * p_block)))
    n_chunks = -(-c // cand_chunk)
    t_pad = _pad_rows(transforms, cand_chunk, 0.0)
    t_chunks = t_pad.reshape(n_chunks, cand_chunk, 4, 4)

    sq_eps = jnp.asarray(epsilon, q_pos.dtype) ** 2

    def score_chunk(tr):
        rot = tr[:, :3, :3]
        trans = tr[:, :3, 3]
        tq = jnp.einsum('cij,nj->cni', rot, q_pos,
                        preferred_element_type=jnp.float32) + trans[:, None]
        tq_sq = jnp.sum(tq * tq, axis=-1)                 # (cc, nq)

        def body(min_d2, blk):
            pb, pb_sq = blk
            cross = jnp.einsum('cni,mi->cnm', tq, pb,
                               preferred_element_type=jnp.float32)
            d2 = tq_sq[..., None] + pb_sq[None, None, :] - 2.0 * cross
            return jnp.minimum(min_d2, jnp.min(d2, axis=-1)), None

        init = jnp.full((tr.shape[0], nq), jnp.inf, dtype=jnp.float32)
        min_d2, _ = jax.lax.scan(body, init, (p_blocks, p_sq))
        return jnp.mean(min_d2 <= sq_eps, axis=-1)

    scores = jax.lax.map(score_chunk, t_chunks).reshape(-1)
    return scores[:c]


def lcp_score_single(transform, q_pos, p_pos, epsilon):
    """Convenience scalar form (the reference's initial
    ``Verify(identity)``, ref:match4pcsBase.hpp:201)."""
    return lcp_scores(transform[None], q_pos, p_pos, epsilon)[0]
