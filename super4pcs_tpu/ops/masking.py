"""Static-shape compaction helpers.

XLA needs static shapes; the reference grows ``std::vector``s with
data-dependent sizes (pairs, congruent quads). The TPU-native pattern is
a fixed-capacity buffer + validity mask: ``masked_indices`` compacts the
True positions of a mask into the first K slots.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_indices_2d(mask: jnp.ndarray, capacity: int):
    """:func:`masked_indices` over a 2-D mask, bit-identical to
    ``masked_indices(mask.reshape(-1), capacity)`` (row-major order)
    but hierarchical: a row-local cumsum (one pass over the matrix,
    along the minor axis) plus a row-count cumsum replace the FLAT
    k1*k2-element prefix sum, and each output slot locates its (row,
    column) with two short binary searches — log2(k1) rounds over the
    k1-entry row table and log2(k2) rounds of single-element gathers
    into the row-local plane. The flat form's cumsum alone was the
    dominant memory traffic of the toy-scale dense join (the hippo
    step's 58 GB cost_analysis, r5); this form touches the matrix
    once.
    """
    k1, k2 = mask.shape
    rl = jnp.cumsum(mask, axis=1, dtype=jnp.int32)   # inclusive, row
    rc = rl[:, -1]
    rb = jnp.cumsum(rc, dtype=jnp.int32)             # inclusive base
    count = rb[-1]
    s = jnp.arange(capacity, dtype=jnp.int32)
    r = jnp.searchsorted(rb, s + 1, side="left", method="scan")
    rsafe = jnp.minimum(r, k1 - 1)
    tgt = s + 1 - (rb[rsafe] - rc[rsafe])            # 1-based in row
    lo = jnp.zeros(capacity, jnp.int32)
    hi = jnp.full(capacity, k2, jnp.int32)
    for _ in range(max(int(k2).bit_length(), 1)):
        mid = (lo + hi) >> 1
        go = rl[rsafe, jnp.minimum(mid, k2 - 1)] < tgt
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    valid = s < jnp.minimum(count, capacity)
    idx = jnp.where(valid, rsafe * k2 + lo, 0).astype(jnp.int32)
    return idx, valid, count


def masked_indices(mask: jnp.ndarray, capacity: int):
    """Indices of True entries of a flat bool mask, compacted to a static
    ``(capacity,)`` buffer (ascending order; surplus entries dropped).

    Returns (idx, valid, count): ``idx`` int32 (clamped safe for gather),
    ``valid`` bool marks live slots, ``count`` the true number of set
    bits (may exceed capacity — callers use it to report overflow).
    """
    n = mask.shape[0]
    if n > 8 * capacity:
        # Gather form: binary-search the inclusive prefix sum for each
        # output slot (slot s holds the first index where csum == s+1).
        # TPU scatter retires ~1 update/cycle, so scattering n updates
        # dominates when n >> capacity; capacity*log(n) gathers are ~3x
        # cheaper at pair-extraction scales (n ~ 4M, capacity ~ 32k).
        csum = jnp.cumsum(mask, dtype=jnp.int32)
        count = csum[-1]
        s = jnp.arange(capacity, dtype=jnp.int32)
        idx = jnp.searchsorted(csum, s + 1, side='left', method='scan')
        valid = s < count
        idx = jnp.where(valid, idx, 0).astype(jnp.int32)
        return idx, valid, count

    # Scatter form: exclusive prefix sum assigns each True element its
    # output slot. Replaces a top_k (full sort) formulation that
    # dominated step time at join sizes of ~10^7 elements. Overflow
    # (slot >= capacity) is routed to a dump slot and dropped.
    pos = jnp.cumsum(mask, dtype=jnp.int32) - 1
    target = jnp.where(mask & (pos < capacity), pos, capacity)
    out = jnp.full((capacity + 1,), n, dtype=jnp.int32)
    out = out.at[target].set(jnp.arange(n, dtype=jnp.int32),
                             mode="drop", unique_indices=False)
    idx = out[:capacity]
    valid = idx < n
    idx = jnp.where(valid, idx, 0)
    count = jnp.sum(mask, dtype=jnp.int32)
    return idx, valid, count
