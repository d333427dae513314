"""LCP (Largest Common Pointset) verification.

TPU-native replacement for ``Match4PCSBase::Verify``
(ref:src/super4pcs/algorithms/match4pcsBase.cc:504-567): the reference
walks a kd-tree once per transformed Q point with an early exit guarded
by the shared best LCP; here *all* candidate transforms of a device step
are scored in one batched, tiled min-distance program:

    lcp(c) = (1/|Q|) * #{ i : min_j || T_c q_i - p_j ||^2 <= delta^2 }

The cross term rides the MXU via the ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b
expansion; P is processed in blocks with a running minimum so the full
C x |Q| x |P| distance tensor never materializes. The expansion loses
~|a|^2 * eps_f32 of absolute precision to cancellation, so it is used
only to find the *argmin* neighbor; the winning distance is then
recomputed exactly as sum((a-b)^2) before the threshold test. A Pallas
kernel version lives in ``super4pcs_tpu.kernels.lcp_pallas``; this XLA
fallback is the oracle (exact same math) and the CPU-test path.

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

# Q-side padding sentinel (parallel/batch.py pads ragged Q clouds to the
# batch maximum with rows at this coordinate). Rows with |x| >= Q_PAD
# are excluded from the LCP denominator, so a padded cloud's LCP equals
# its unpadded LCP exactly. Kept an order of magnitude below the P
# sentinel so every cross term stays finite in float32.
Q_PAD = 1.0e17


def q_valid_mask(q_pos):
    """(Nq,) bool — False on Q_PAD padding rows (see parallel/batch.py).
    All-True on any real cloud (coordinates are centroid-centered)."""
    return jnp.abs(q_pos[:, 0]) < Q_PAD


def _masked_lcp_mean(hits, q_pos):
    """Fraction of hits over *real* Q rows: ``hits`` (..., Nq) bool."""
    qm = q_valid_mask(q_pos)
    denom = jnp.maximum(jnp.sum(qm, dtype=jnp.float32), 1.0)
    return jnp.sum(hits & qm, axis=-1, dtype=jnp.float32) / denom


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pad_rows(x, multiple, value):
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = jnp.full((rem,) + x.shape[1:], value, dtype=x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return x


def lcp_scores(transforms, q_pos, p_pos, epsilon,
               p_block: int = 2048, elem_budget: int = 32 * 1024 * 1024,
               use_pallas: bool = True):
    """LCP fraction for each candidate transform.

    On TPU backends dispatches to the fused Pallas VPU kernel
    (kernels/lcp_pallas.py, ~6x faster); the XLA expansion path below is
    the exact-parity oracle and the CPU path.

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
    if use_pallas:
        from ..kernels import lcp_pallas
        np_count = int(p_pos.shape[0])
        nq_count = int(q_pos.shape[0])
        if lcp_pallas.supported(np_count, nq_count):
            return lcp_pallas.lcp_scores_pallas(
                transforms, q_pos, p_pos, epsilon)
        if (lcp_pallas.supported(0, 0)
                and nq_count <= lcp_pallas.MAX_Q_VMEM
                and np_count <= lcp_pallas.MAX_P_STREAM):
            # P too big for VMEM residency: stream it through the
            # Pallas pipeline instead of falling back to XLA
            return lcp_pallas.lcp_scores_pallas_streamed(
                transforms, q_pos, p_pos, epsilon)

    c = transforms.shape[0]
    nq = q_pos.shape[0]

    # never pad P beyond the next lane multiple (small clouds would
    # otherwise burn p_block/|P| of the matmul on padding)
    p_block = min(p_block, _round_up(p_pos.shape[0], 128))
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
                        precision=jax.lax.Precision.HIGHEST) + trans[:, None]
        tq_sq = jnp.sum(tq * tq, axis=-1)                 # (cc, nq)

        def body(carry, blk):
            min_d2, min_idx = carry
            pb, pb_sq, base = blk
            # HIGHEST: on TPU the default bf16 matmul precision loses
            # ~0.4% relative — enough to misrank near-tied neighbors,
            # which the exact recompute below cannot repair.
            cross = jnp.einsum('cni,mi->cnm', tq, pb,
                               precision=jax.lax.Precision.HIGHEST)
            d2 = tq_sq[..., None] + pb_sq[None, None, :] - 2.0 * cross
            blk_arg = jnp.argmin(d2, axis=-1)             # (cc, nq)
            blk_min = jnp.take_along_axis(
                d2, blk_arg[..., None], axis=-1)[..., 0]
            better = blk_min < min_d2
            min_d2 = jnp.where(better, blk_min, min_d2)
            min_idx = jnp.where(better, base + blk_arg, min_idx)
            return (min_d2, min_idx), None

        init = (jnp.full((tr.shape[0], nq), jnp.inf, dtype=jnp.float32),
                jnp.zeros((tr.shape[0], nq), dtype=jnp.int32))
        bases = (jnp.arange(n_pblocks, dtype=jnp.int32) * p_block)
        (_, min_idx), _ = jax.lax.scan(body, init, (p_blocks, p_sq, bases))

        # Exact recompute of the winning neighbor distance: the expansion
        # above is only trusted to pick the argmin; cancellation error
        # (~|a|^2 * 1.2e-7) would otherwise swamp small epsilons.
        nearest = p_pad[min_idx]                          # (cc, nq, 3)
        d2_exact = jnp.sum((tq - nearest) ** 2, axis=-1)
        return _masked_lcp_mean(d2_exact <= sq_eps, q_pos)

    scores = jax.lax.map(score_chunk, t_chunks).reshape(-1)
    return scores[:c]


def lcp_score_single(transform, q_pos, p_pos, epsilon):
    """Convenience scalar form (the reference's initial
    ``Verify(identity)``, ref:match4pcsBase.hpp:201)."""
    return lcp_scores(transform[None], q_pos, p_pos, epsilon)[0]


def lcp_scores_two_stage(transforms, q_pos, p_pos, epsilon,
                         coarse_q: int = 64, coarse_p: int = 2048,
                         top_k: int = 2048, live=None):
    """Two-stage LCP: coarse rank on subsampled clouds, exact score for
    the ``top_k`` survivors.

    The batched analog of the reference Verify's early exit (it aborts a
    candidate once it provably can't beat ``best_LCP_``,
    ref:match4pcsBase.cc:520-558): almost all congruent candidates are
    garbage, so they are ranked with a ~20x cheaper subsampled LCP and
    only the best ``top_k`` get the full O(|Q||P|) scoring. With
    coarse_q >= 48 the subsample noise (~sqrt(l(1-l)/coarse_q) ~ 0.07)
    is far below the true-vs-garbage gap, so the argmax is preserved
    with overwhelming probability.

    Returns (scores, scored_idx): exact scores (top_k,) and their
    indices into ``transforms``; non-selected candidates are not scored.
    """
    c = transforms.shape[0]
    if c <= top_k:
        return lcp_scores(transforms, q_pos, p_pos, epsilon), \
            jnp.arange(c, dtype=jnp.int32)

    sq = max(1, -(-q_pos.shape[0] // coarse_q))
    sp = max(1, -(-p_pos.shape[0] // coarse_p))
    coarse = lcp_scores(transforms, q_pos[::sq], p_pos[::sp], epsilon)
    if live is not None:
        # dead buffer slots carry index-0-clamped duplicate transforms;
        # left unmasked they can flood the top_k and evict every live
        # candidate
        coarse = jnp.where(live, coarse, -1.0)
    _, idx = jax.lax.top_k(coarse, top_k)
    idx = idx.astype(jnp.int32)

    # At large Nq an exact pass over all top_k survivors still costs
    # teraops (top_k * Nq * Np); insert a mid-resolution stage and
    # exact-score only the best few — the step's argmax needs the exact
    # value of the winner, not of every survivor (mid-stage sampling
    # noise ~sqrt(l(1-l)/512) ~ 0.02 << candidate score gaps).
    if q_pos.shape[0] > 1024:
        mq = max(1, -(-q_pos.shape[0] // 512))
        mp = max(1, -(-p_pos.shape[0] // 8192))
        mid = lcp_scores(transforms[idx], q_pos[::mq], p_pos[::mp],
                         epsilon)
        if live is not None:
            # re-apply the live mask: when live candidates < top_k, the
            # coarse top_k admits dead slots whose tied mid scores would
            # otherwise flood the keep=64 selection (same flood class as
            # the coarse stage above)
            mid = jnp.where(live[idx], mid, -1.0)
        keep = min(64, top_k)
        _, midsel = jax.lax.top_k(mid, keep)
        idx = idx[midsel.astype(jnp.int32)]

    exact = lcp_scores(transforms[idx], q_pos, p_pos, epsilon)
    return exact, idx
