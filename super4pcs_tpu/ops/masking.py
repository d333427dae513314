"""Static-shape compaction helpers.

XLA needs static shapes; the reference grows ``std::vector``s with
data-dependent sizes (pairs, congruent quads). The TPU-native pattern is
a fixed-capacity buffer + validity mask: ``masked_indices`` compacts the
True positions of a mask into the first K slots.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_indices(mask: jnp.ndarray, capacity: int):
    """Indices of True entries of a flat bool mask, compacted to a static
    ``(capacity,)`` buffer (ascending order; surplus entries dropped).

    Returns (idx, valid, count): ``idx`` int32 (clamped safe for gather),
    ``valid`` bool marks live slots, ``count`` the true number of set
    bits (may exceed capacity — callers use it to report overflow).
    """
    n = mask.shape[0]
    keys = jnp.where(mask, jnp.arange(n, dtype=jnp.int32),
                     jnp.int32(n))
    k = min(capacity, n)
    # top_k of the negation -> the k smallest keys, ascending.
    neg_top, _ = jax.lax.top_k(-keys, k)
    idx = -neg_top
    if k < capacity:
        idx = jnp.concatenate(
            [idx, jnp.full((capacity - k,), n, dtype=jnp.int32)])
    valid = idx < n
    idx = jnp.where(valid, idx, 0)
    count = jnp.sum(mask, dtype=jnp.int32)
    return idx, valid, count
