"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest forces ``xla_force_host_platform_device_count=8`` — the
rebuild analog of testing against a brute-force oracle instead of live
infrastructure, SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from super4pcs_tpu import Match4PCS, MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.parallel import make_mesh, register_batch
from tests.test_matcher import bumpy_cloud, rot_tr_diff


def make_pair(rng, make_transform, n=200):
    pos = bumpy_cloud(rng, n)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    return pos, q, mat


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8


def test_sharded_matcher_recovers_transform(rng, make_transform):
    pos, q, mat = make_pair(rng, make_transform)
    mesh = make_mesh()
    opts = Options(delta=0.05, sample_size=200, max_time_seconds=30,
                   bases_per_step=8, max_quads=1024, max_candidates=2048,
                   random_seed=7).configure_overlap(0.9)
    matcher = MatchSuper4PCS(opts, mesh=mesh)
    res = matcher.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert res.score > 0.9
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1


def test_sharded_matches_single_device(rng, make_transform):
    """Same seed: the sharded step must find the same best LCP as the
    single-device step (bases and candidate scoring are identical; only
    the argmax is distributed)."""
    pos, q, mat = make_pair(rng, make_transform, n=150)
    opts = Options(delta=0.05, sample_size=150, max_time_seconds=30,
                   bases_per_step=8, max_quads=1024, max_candidates=2048,
                   random_seed=11).configure_overlap(0.9)
    r_single = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    r_shard = MatchSuper4PCS(opts, mesh=make_mesh()).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert abs(r_single.score - r_shard.score) < 0.05


def test_bases_divisibility_validated():
    with pytest.raises(ValueError):
        MatchSuper4PCS(Options(bases_per_step=6), mesh=make_mesh())


def test_register_batch_sharded(rng, make_transform):
    """8 independent pairs sharded over the 8-device mesh — the
    scan-graph batch mode (BASELINE.json config #5)."""
    pairs, mats = [], []
    for _ in range(8):
        pos, q, mat = make_pair(rng, make_transform, n=120)
        pairs.append((PointCloud(pos=pos), PointCloud(pos=q)))
        mats.append(mat)
    opts = Options(delta=0.05, sample_size=120, max_time_seconds=60,
                   bases_per_step=4, max_quads=512, max_candidates=512,
                   random_seed=3).configure_overlap(0.9)
    results = register_batch(pairs, opts, mesh=make_mesh(axis="pairs"))
    assert len(results) == 8
    ok = 0
    for res, mat in zip(results, mats):
        rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
        if res.score > 0.8 and rot_diff <= 0.2 and tr_diff <= 0.1:
            ok += 1
    # RANSAC is stochastic per pair; the batch must solve the large
    # majority within the shared trial budget
    assert ok >= 6, f"only {ok}/8 pairs registered"


def test_register_batch_unsharded(rng, make_transform):
    pos, q, mat = make_pair(rng, make_transform, n=100)
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=30,
                   bases_per_step=4, random_seed=5).configure_overlap(0.9)
    results = register_batch(
        [(PointCloud(pos=pos), PointCloud(pos=q))] * 2, opts)
    assert len(results) == 2
    for res in results:
        assert res.score > 0.8
