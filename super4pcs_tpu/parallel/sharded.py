"""Bases-axis sharding of the RANSAC device step.

Each device receives a shard of the per-base PRNG keys and runs the
*same* single-device step program (matcher._build_step's ``step``) on
its shard; the global best candidate is then selected with one
``all_gather`` of the tiny per-device results followed by an argmax —
a single small collective riding ICI per step. This replaces the
reference's shared-mutable ``best_LCP_`` + ``omp critical``
(ref:src/super4pcs/algorithms/match4pcsBase.hpp:467-484) with a
reduction, which is both deterministic and scalable.

Point clouds are replicated: at the algorithm's operating points the
sampled clouds are a few thousand points (< 1 MB) while the per-base
work (pair extraction, joins, LCP over tens of thousands of candidate
transforms) dominates — replicate the small thing, shard the big axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

BASES_AXIS = "bases"


def make_mesh(devices=None, axis: str = BASES_AXIS) -> Mesh:
    """1-D mesh over ``devices`` (default: all local devices)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_step(step_fn, mesh: Mesh, axis: str = BASES_AXIS,
                 gather_telemetry: bool = True):
    """Wrap a single-device step into an SPMD step over ``mesh``.

    ``step_fn(keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb)``
    must
    return the matcher step dict (lcp/transform/qcentroid1/qcentroid2/
    base_ids/congruent_ids scalars-or-small arrays of the *best local*
    candidate, plus n_congruent and per-base pair_counts telemetry).

    Returns a jitted function with the same signature; ``keys`` is
    sharded over ``axis``, the clouds are replicated, and the output is
    replicated (identical on every device).

    ``gather_telemetry=False`` takes the per-base ``pair_counts`` table
    — the one output whose size grows with bases_per_step x mesh size;
    everything else is O(1) — out of the in-step all_gather and returns
    it as a SHARDED output instead (out_spec P(axis)): the information
    is identical, but the concatenation happens lazily at host read
    time rather than as an ICI collective inside every step. Measured
    overhead of the full gather on the 8-device virtual mesh is
    recorded in BASELINE.md (sharding table); flip this off at real
    mesh sizes if it shows up on profiles.
    """
    rep = P()
    # (keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb)
    in_specs = (P(axis), rep, rep, rep, rep, rep, rep, rep)
    out_names = ("lcp", "rank_lcp", "transform", "qcentroid1",
                 "qcentroid2", "base_ids", "congruent_ids")
    out_specs = {name: rep for name in out_names}
    out_specs.update(n_congruent=rep, cands_dropped=rep,
                     pair_counts=rep if gather_telemetry else P(axis))

    def spmd(keys, diam, p_pos, p_norm, p_rgb, q_pos, q_norm, q_rgb):
        local = step_fn(keys, diam, p_pos, p_norm, p_rgb,
                        q_pos, q_norm, q_rgb)

        # gather the tiny per-device results; pick the argmax device.
        pair_counts = local.pop("pair_counts")
        if gather_telemetry:
            local["pair_counts"] = pair_counts
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis), local)
        # rank metric == exact lcp except in coarse-search mode (see
        # matcher.build_step rank_delta)
        best_dev = jnp.argmax(gathered["rank_lcp"])

        out = {}
        for name in out_names:
            out[name] = gathered[name][best_dev]
        # telemetry: sum counters, concatenate per-base tables
        out["n_congruent"] = jnp.sum(gathered["n_congruent"])
        out["cands_dropped"] = jnp.sum(gathered["cands_dropped"])
        if gather_telemetry:
            pc = gathered["pair_counts"]
            out["pair_counts"] = pc.reshape((-1,) + pc.shape[2:])
        else:
            out["pair_counts"] = pair_counts  # sharded leaf, P(axis)
        return out

    spmd = shard_map(spmd, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)

    return jax.jit(spmd)
