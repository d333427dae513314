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


def test_sharded_lazy_telemetry_matches(rng, make_transform):
    """sharded_gather_telemetry=False keeps pair_counts as a sharded
    step output (no in-step all_gather) — results and the overflow
    telemetry derived from the table must be identical to the gathered
    path (the knob only moves WHERE the concatenation happens)."""
    pos, q, mat = make_pair(rng, make_transform, n=150)
    opts = Options(delta=0.05, sample_size=150, max_time_seconds=30,
                   bases_per_step=8, max_quads=1024, max_candidates=2048,
                   random_seed=11).configure_overlap(0.9)
    r_gather = MatchSuper4PCS(opts, mesh=make_mesh()).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    r_lazy = MatchSuper4PCS(
        opts.replace(sharded_gather_telemetry=False),
        mesh=make_mesh()).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert r_lazy.score == r_gather.score
    for key in ("pairs_overflow", "quads_overflow", "cell_dropped",
                "n_congruent"):
        assert r_lazy.stats[key] == r_gather.stats[key], key


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


def test_register_batch_coarse_search(rng, make_transform):
    """Explicit coarse factor in batch mode: rank-best transforms are
    tracked per pair and redeemed through the guarded refine stage, so
    a sparse-subsample pair still registers (mirrors the single-pair
    test_search_delta_factor_coarse_search)."""
    pos, q_full, mat = make_pair(rng, make_transform, n=500)
    keep = rng.choice(len(q_full), 180, replace=False)
    q = (q_full[keep]
         + rng.normal(scale=0.008, size=(180, 3))).astype(np.float32)
    opts = Options(delta=0.025, sample_size=180, max_time_seconds=45,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=13, search_delta_factor=2.0,
                   ).configure_overlap(0.5, terminate_threshold=0.9)
    res = register_batch(
        [(PointCloud(pos=pos), PointCloud(pos=q))] * 2, opts)[0]
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, res.score)


def test_register_batch_unsharded(rng, make_transform):
    pos, q, mat = make_pair(rng, make_transform, n=100)
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=30,
                   bases_per_step=4, random_seed=5).configure_overlap(0.9)
    results = register_batch(
        [(PointCloud(pos=pos), PointCloud(pos=q))] * 2, opts)
    assert len(results) == 2
    for res in results:
        assert res.score > 0.8


def test_sentinel_padded_lcp_exact(rng, make_transform):
    """A Q cloud sentinel-padded to a larger batch shape must score
    bit-exactly the same LCP as its unpadded form (the masked
    denominator of ops/lcp.py — no repeat-padding re-weight)."""
    import jax.numpy as jnp
    from super4pcs_tpu.ops import lcp
    from super4pcs_tpu.parallel.batch import _Q_SENTINEL

    pos, q, _ = make_pair(rng, make_transform, n=150)
    transforms = jnp.asarray(np.stack([
        np.eye(4, dtype=np.float32),
        make_transform(max_translation=0.2),
        make_transform(max_translation=0.5)]))
    q_pad = np.concatenate(
        [q, np.full((70, 3), _Q_SENTINEL, np.float32)])
    plain = np.asarray(lcp.lcp_scores(
        transforms, jnp.asarray(q), jnp.asarray(pos), 0.05))
    padded = np.asarray(lcp.lcp_scores(
        transforms, jnp.asarray(q_pad), jnp.asarray(pos), 0.05))
    assert (plain == padded).all(), (plain, padded)
    # two-stage path too (the production step's scorer): the coarse
    # *selection* may differ with the padded shape (subsample stride is
    # shape-derived), but whatever it selects must carry the exact
    # unpadded score
    s_pad, idx_pad = lcp.lcp_scores_two_stage(
        transforms, jnp.asarray(q_pad), jnp.asarray(pos), 0.05, top_k=2)
    assert (np.asarray(s_pad) == plain[np.asarray(idx_pad)]).all()


def test_register_batch_ragged_sizes(rng, make_transform):
    """Pairs of different cloud sizes in one batch: the smaller Q is
    sentinel-padded; its registration quality must match a single-pair
    run, and per-pair stats (incl. padding telemetry) are populated."""
    pos_a, q_a, mat_a = make_pair(rng, make_transform, n=140)
    pos_b, q_b, mat_b = make_pair(rng, make_transform, n=90)
    opts = Options(delta=0.05, sample_size=140, max_time_seconds=40,
                   bases_per_step=4, max_quads=512, max_candidates=512,
                   random_seed=5).configure_overlap(0.9)
    results = register_batch(
        [(PointCloud(pos=pos_a), PointCloud(pos=q_a)),
         (PointCloud(pos=pos_b), PointCloud(pos=q_b))], opts)
    assert results[1].stats["q_padded"] > 0
    for res, mat in zip(results, (mat_a, mat_b)):
        assert res.score > 0.8, res.score
        rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
        assert rot_diff <= 0.2 and tr_diff <= 0.1
        # single-pair stats contract: overflow telemetry + timings
        for k in ("pairs_overflow", "quads_overflow", "cands_overflow",
                  "n_congruent", "cell_dropped", "search_seconds",
                  "compile_seconds"):
            assert k in res.stats, k


def test_register_batch_visitor_stream(rng, make_transform):
    pos, q, _ = make_pair(rng, make_transform, n=100)
    calls = []

    class Recorder:
        def __call__(self, fraction, scores, mats):
            calls.append((fraction, np.array(scores), np.array(mats)))

        def needs_global_transformation(self):
            return True

    opts = Options(delta=0.05, sample_size=100, max_time_seconds=30,
                   bases_per_step=4, random_seed=5).configure_overlap(0.9)
    register_batch([(PointCloud(pos=pos), PointCloud(pos=q))] * 2, opts,
                   visitor=Recorder())
    assert calls[0][0] == 0.0
    assert any(f == -1.0 for f, _, _ in calls)
    assert calls[-1][1].shape == (2,)
    assert calls[-1][2].shape == (2, 4, 4)
    # per-pair best LCP is non-decreasing along the stream
    lcps = np.stack([s for _, s, _ in calls])
    assert (np.diff(lcps, axis=0) >= -1e-9).all()


def test_register_batch_resume(rng, make_transform):
    """An interrupted batch resumed from its exported state reaches the
    same quality as an uninterrupted run (same PRNG stream)."""
    pos, q, mat = make_pair(rng, make_transform, n=100)
    pairs = [(PointCloud(pos=pos), PointCloud(pos=q))] * 2
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=40,
                   bases_per_step=4, max_quads=512, max_candidates=512,
                   random_seed=5).configure_overlap(0.6, 0.999)

    full = register_batch(pairs, opts)

    # interrupt after ~1 step via a sub-second budget
    part = register_batch(
        pairs, opts.replace(max_time_seconds=1, refine_iterations=0))
    state = part[0].stats["batch_state"]
    resumed = register_batch(pairs, opts, resume_state=state)
    assert resumed[0].n_trials >= full[0].n_trials
    for r_res, f_res in zip(resumed, full):
        assert r_res.score >= f_res.score - 0.05


def test_batch_straggler_escalation(rng, make_transform):
    """One hard pair in a batch (sparse noisy subsample — the single-
    pair escalation fixture) reaches the terminate threshold through
    straggler redemption: the batch program itself is never recompiled;
    the pair is re-registered individually at the escalated factor
    (VERDICT r2 #8)."""
    # easy pair: clean transformed copy
    pos_e, q_e, mat_e = make_pair(rng, make_transform, n=200)
    # hard pair: 160-of-500 subsample + noise at delta/3
    pos_h = bumpy_cloud(rng, 500)
    keep = rng.choice(500, 160, replace=False)
    mat_h = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat_h)
    q_h = (pos_h[keep] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q_h += rng.normal(scale=0.008, size=q_h.shape).astype(np.float32)

    # seed 5: batch phase deterministically exhausts its estimate at
    # LCP ~0.05 on the hard pair (seed sweep in the round-3 notes);
    # redemption recovers it to ~0.99 with exact pose
    opts = Options(delta=0.025, sample_size=200, max_time_seconds=240,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=5, search_escalation_factor=2.0,
                   ).configure_overlap(0.9, terminate_threshold=0.95)
    results = register_batch(
        [(PointCloud(pos=pos_e), PointCloud(pos=q_e)),
         (PointCloud(pos=pos_h), PointCloud(pos=q_h))], opts)

    assert results[0].score >= 0.95
    rot_diff, tr_diff = rot_tr_diff(results[0].transform, mat_e)
    assert rot_diff <= 0.2 and tr_diff <= 0.1
    # the hard pair must have gone through redemption and ended correct
    assert results[1].stats.get("straggler_escalated_to") == 2.0
    rot_diff, tr_diff = rot_tr_diff(results[1].transform, mat_h)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, results[1].score)


def test_register_batch_banded_engine(rng, make_transform):
    """Banded x batch composition (VERDICT r3 #4): forcing the banded
    pair engine in a ragged batch must register every pair — per-pair
    band indexes are padded to one shared shape and vmapped through the
    step (no silent rowcap downgrade). Quality must match the
    single-pair banded matcher on the same pair/seed."""
    pos_a, q_a, mat_a = make_pair(rng, make_transform, n=140)
    pos_b, q_b, mat_b = make_pair(rng, make_transform, n=90)
    opts = Options(delta=0.05, sample_size=140, max_time_seconds=60,
                   bases_per_step=4, max_quads=512, max_candidates=512,
                   random_seed=5, pair_engine="banded",
                   ).configure_overlap(0.9)
    results = register_batch(
        [(PointCloud(pos=pos_a), PointCloud(pos=q_a)),
         (PointCloud(pos=pos_b), PointCloud(pos=q_b))], opts)
    assert results[1].stats["q_padded"] > 0
    assert results[0].stats["band_cells"] > 0
    for res, mat in zip(results, (mat_a, mat_b)):
        assert res.score > 0.8, res.score
        rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
        assert rot_diff <= 0.2 and tr_diff <= 0.1

    # parity vs the single-pair banded matcher on pair a
    single = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos_a), PointCloud(pos=q_a))
    assert abs(single.score - results[0].score) < 0.1


def test_register_batch_banded_sharded(rng, make_transform):
    """Banded x batch x mesh: the batched band index shards along the
    pairs axis with the clouds."""
    prs, mats = [], []
    for i in range(8):
        pos, q, mat = make_pair(rng, make_transform, n=100)
        prs.append((PointCloud(pos=pos), PointCloud(pos=q)))
        mats.append(mat)
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=60,
                   bases_per_step=4, max_quads=512, max_candidates=512,
                   random_seed=3, pair_engine="banded",
                   ).configure_overlap(0.9)
    results = register_batch(prs, opts, mesh=make_mesh(axis="pairs"))
    ok = sum(1 for res, mat in zip(results, mats)
             if res.score > 0.8
             and max(rot_tr_diff(res.transform, mat)) <= 0.2)
    assert ok >= 7, [r.score for r in results]
