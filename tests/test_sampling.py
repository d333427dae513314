"""Voxel-sampler semantics vs a direct oracle (reference behavior:
ref:src/super4pcs/sampling.h:59-121)."""

import numpy as np

from super4pcs_tpu.cloud import PointCloud
from super4pcs_tpu.ops import sampling


def oracle_first_per_voxel(pos, voxel):
    """Literal keep-first-per-voxel scan, the reference semantics."""
    seen = set()
    keep = []
    for i, p in enumerate(pos):
        c = tuple(int(np.floor(v / voxel)) for v in p)
        if c not in seen:
            seen.add(c)
            keep.append(i)
    return np.array(keep)


def test_matches_oracle(rng):
    pos = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    idx = sampling.voxel_indices(pos, 0.25)
    expected = oracle_first_per_voxel(pos, 0.25)
    np.testing.assert_array_equal(idx, expected)


def test_matches_oracle_huge_extent(rng):
    """Cell spans beyond the 21-bit packing range take the row-wise
    fallback; semantics must not change at the switch."""
    pos = (rng.uniform(-1, 1, size=(300, 3)) * 1e6).astype(np.float32)
    idx = sampling.voxel_indices(pos, 0.25)   # span ~8e6 cells per axis
    expected = oracle_first_per_voxel(pos, 0.25)
    np.testing.assert_array_equal(idx, expected)


def test_one_point_per_voxel(rng):
    pos = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    out = sampling.uniform_dist_sample(PointCloud(pos=pos), 0.2)
    cells = np.floor(out.pos / 0.2).astype(int)
    assert len(np.unique(cells, axis=0)) == len(out)


def test_small_cloud_used_whole(rng):
    pos = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    cloud = PointCloud(pos=pos)
    out = sampling.sample_for_matching(cloud, 0.5, 200, truncate=True,
                                       rng=rng)
    assert len(out) == 50  # ref:match4pcsBase.hpp:112-138 else-branch


def test_q_truncation(rng):
    pos = rng.uniform(0, 1, size=(5000, 3)).astype(np.float32)
    cloud = PointCloud(pos=pos)
    out_q = sampling.sample_for_matching(cloud, 0.01, 200, truncate=True,
                                         rng=rng)
    assert len(out_q) == 200
    out_p = sampling.sample_for_matching(cloud, 0.01, 200, truncate=False,
                                         rng=rng)
    assert len(out_p) > 200  # P keeps the full voxel-sampled set


def test_attributes_follow(rng):
    pos = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    normal = rng.normal(size=(300, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    cloud = PointCloud(pos=pos, normal=normal, rgb=rgb)
    out = sampling.uniform_dist_sample(cloud, 0.3)
    idx = sampling.voxel_indices(pos, 0.3)
    np.testing.assert_array_equal(out.normal, normal[idx])
    np.testing.assert_array_equal(out.rgb, rgb[idx])
