"""Static-shape compaction helpers.

XLA needs static shapes; the reference grows ``std::vector``s with
data-dependent sizes (pairs, congruent quads). The TPU-native pattern is
a fixed-capacity buffer + validity mask: ``masked_indices`` compacts the
True positions of a mask into the first K slots.
"""

from __future__ import annotations

import jax.numpy as jnp


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
