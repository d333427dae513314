"""Pair extraction vs a literal brute-force oracle — the rebuild analog
of the reference's pair_extraction test (exact set equality against
brute force, ref:tests/pair_extraction.cc:207-208)."""

import math

import numpy as np
import jax.numpy as jnp

from super4pcs_tpu.ops.pairs import PairFilterConfig, extract_pairs


def oracle_pairs(pos, normal, rgb, base_pos, base_norm, base_rgb,
                 e0, e1, cfg):
    """Literal transcription of the reference pair filter
    (ref:algorithms/pairCreationFunctor.h:151-218, per-pair semantics)."""
    out = []
    n = len(pos)
    pair_distance = np.linalg.norm(base_pos[e0] - base_pos[e1])
    pna = np.linalg.norm(base_norm[e0] - base_norm[e1])
    eps = cfg["pair_distance_epsilon"]
    seg1 = base_pos[e1] - base_pos[e0]
    seg1 = seg1 / np.linalg.norm(seg1)
    for j in range(n):
        for i in range(j + 1, n):
            p, q = pos[j], pos[i]
            distance = np.linalg.norm(q - p)
            if abs(distance - pair_distance) > eps:
                continue
            mnd = cfg["max_normal_difference"]
            if (mnd > 0 and np.dot(normal[i], normal[i]) > 0
                    and np.dot(normal[j], normal[j]) > 0):
                thr = 0.5 * mnd * math.pi / 180.0
                fa = np.linalg.norm(normal[i] - normal[j])
                sa = np.linalg.norm(normal[i] + normal[j])
                if min(abs(fa - pna), abs(sa - pna)) > thr:
                    continue
            mcd = cfg["max_color_distance"]
            if mcd > 0:
                use_rgb = (rgb[j][0] >= 0 and rgb[i][0] >= 0
                           and base_rgb[e0][0] >= 0 and base_rgb[e1][0] >= 0)
                good = (np.linalg.norm(rgb[j] - base_rgb[e0]) < mcd
                        and np.linalg.norm(rgb[i] - base_rgb[e1]) < mcd)
                if use_rgb and not good:
                    continue
            mtd = cfg["max_translation_distance"]
            if mtd > 0:
                if not (np.linalg.norm(p - base_pos[e0]) < mtd
                        and np.linalg.norm(q - base_pos[e1]) < mtd):
                    continue
            ma = cfg["max_angle"]
            if ma > 0:
                seg2 = (q - p) / np.linalg.norm(q - p)
                mar = ma * math.pi / 180.0
                if math.acos(np.clip(np.dot(seg1, seg2), -1, 1)) <= mar:
                    out.append((j, i))
                if math.acos(np.clip(np.dot(seg1, -seg2), -1, 1)) <= mar:
                    out.append((i, j))
            else:
                out.append((j, i))
                out.append((i, j))
    return set(out)


def run_case(rng, n=60, **filters):
    pos = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    rgb = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    # some points without color (sentinel -1, ref:shared4pcs.h:110)
    rgb[rng.uniform(size=n) < 0.3] = -1.0

    base_idx = rng.choice(n, size=4, replace=False)
    base_pos, base_norm, base_rgb = (pos[base_idx], normal[base_idx],
                                     rgb[base_idx])

    cfg_d = dict(max_normal_difference=-1.0, max_color_distance=-1.0,
                 max_translation_distance=-1.0, max_angle=-1.0,
                 pair_distance_epsilon=0.3)
    cfg_d.update(filters)
    cfg = PairFilterConfig(
        max_normal_difference=cfg_d["max_normal_difference"],
        max_color_distance=cfg_d["max_color_distance"],
        max_translation_distance=cfg_d["max_translation_distance"],
        max_angle=cfg_d["max_angle"])

    pairs, valid, count = extract_pairs(
        jnp.asarray(pos), jnp.asarray(normal), jnp.asarray(rgb),
        jnp.asarray(base_pos), jnp.asarray(base_norm), jnp.asarray(base_rgb),
        0, 1, cfg_d["pair_distance_epsilon"], cfg, capacity=4096)
    got = {tuple(p) for p, v in zip(np.asarray(pairs), np.asarray(valid))
           if v}
    expected = oracle_pairs(pos, normal, rgb, base_pos, base_norm, base_rgb,
                            0, 1, cfg_d)
    assert int(count) == len(expected)
    assert got == expected, (
        f"missing={expected - got} extra={got - expected}")


def test_distance_only(rng):
    run_case(rng)


def test_normal_filter(rng):
    run_case(rng, max_normal_difference=30.0)


def test_color_filter(rng):
    run_case(rng, max_color_distance=0.4)


def test_translation_filter(rng):
    run_case(rng, max_translation_distance=1.0)


def test_angle_filter(rng):
    run_case(rng, max_angle=60.0)


def test_all_filters(rng):
    run_case(rng, max_normal_difference=45.0, max_color_distance=0.6,
             max_translation_distance=1.5, max_angle=90.0)


def test_capacity_overflow_reports_true_count(rng):
    pos = rng.uniform(-0.1, 0.1, size=(40, 3)).astype(np.float32)
    zero = np.zeros_like(pos)
    rgb = np.full_like(pos, -1.0)
    base_pos = pos[:4]
    cfg = PairFilterConfig()
    pairs, valid, count = extract_pairs(
        jnp.asarray(pos), jnp.asarray(zero), jnp.asarray(rgb),
        jnp.asarray(base_pos), jnp.asarray(zero[:4]), jnp.asarray(rgb[:4]),
        0, 1, 10.0, cfg, capacity=8)   # eps huge: all pairs pass
    assert int(valid.sum()) == 8
    assert int(count) == 40 * 39  # both orders of every unordered pair
