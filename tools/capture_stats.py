"""Per-base rowcap capture occupancy at the fine-delta operating point.

Sizes a compaction stage for the congruent join's table sort: the sort
currently processes all nq*row_cap slots per base (invalid padding
included). If the captured fraction is well below 1, compacting valid
slots first shrinks the sort + gather volume proportionally. This tool
reports the distribution of per-base captured counts (sum of hit) for
both base edges so a static table capacity can be chosen with known
drop risk.
"""
import _path  # noqa: F401  (repo root on sys.path)
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import fine_delta_pair
from super4pcs_tpu import Options, PointCloud
from super4pcs_tpu.matcher import MatchSuper4PCS, _enable_compilation_cache
from super4pcs_tpu.options import DISTANCE_FACTOR
from super4pcs_tpu.ops import select
from super4pcs_tpu.ops.pairs import (PairFilterConfig,
                                     extract_pairs_rowcap_layout_both)

B = 64
ROW_CAP = 160


def main():
    _enable_compilation_cache()
    pos, q = fine_delta_pair()
    opts = (Options(delta=0.01, sample_size=8192, max_time_seconds=30,
                    random_seed=5)
            .configure_overlap(0.70, terminate_threshold=0.70))
    m = MatchSuper4PCS(opts)
    m._init(PointCloud(pos=pos), PointCloud(pos=q))
    q_pos, q_norm, q_rgb = m._d_q_pos, m._d_q_norm, m._d_q_rgb
    p_pos, p_norm, p_rgb = m._d_p_pos, m._d_p_norm, m._d_p_rgb
    diam = jnp.float32(m._max_base_diameter)
    eps = DISTANCE_FACTOR * opts.delta
    cfg = PairFilterConfig()

    def one(key):
        ids, inv1, inv2, bvalid = select.select_base(
            key, p_pos, diam, opts.n_triangle_trials)
        off = jax.random.randint(jax.random.fold_in(key, 7919), (),
                                 0, q_pos.shape[0])
        (p1, v1, c1, d1), (p2, v2, c2, d2) = \
            extract_pairs_rowcap_layout_both(
                q_pos, q_norm, q_rgb, p_pos[ids], p_norm[ids], p_rgb[ids],
                eps, cfg, row_cap=ROW_CAP, col_offset=off)
        return (jnp.sum(v1, dtype=jnp.int32), jnp.sum(v2, dtype=jnp.int32),
                c1, c2)

    keys = jax.random.split(jax.random.key(5), B)
    fn = jax.jit(jax.vmap(one))
    t0 = time.perf_counter()
    f1, f2, c1, c2 = [np.asarray(x) for x in fn(keys)]
    print(f"ran {B} bases in {time.perf_counter() - t0:.1f}s "
          f"(incl compile)")
    k1 = q_pos.shape[0] * ROW_CAP
    for name, f in [("edge01", f1), ("edge23", f2)]:
        frac = f / k1
        print(f"{name}: captured/K1 mean {frac.mean():.3f} "
              f"p50 {np.percentile(frac, 50):.3f} "
              f"p90 {np.percentile(frac, 90):.3f} "
              f"p99 {np.percentile(frac, 99):.3f} max {frac.max():.3f}")
    for name, c, f in [("edge01", c1, f1), ("edge23", c2, f2)]:
        print(f"{name}: pre-cap count mean {c.mean():.0f} "
              f"max {c.max()}  row-cap loss mean "
              f"{(c - f).mean():.0f} ({(c - f).sum() / max(c.sum(), 1):.1%})")


if __name__ == "__main__":
    main()
