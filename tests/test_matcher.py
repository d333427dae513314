"""End-to-end registration on synthetic clouds.

The rebuild analog of the reference's matching integration test
(ref:tests/matching.cc:309-335): register a transformed copy against
the original and check rotation/translation recovery within the same
thresholds (rotDiff <= 0.2 quaternion units, trDiff <= 0.1)."""

import numpy as np
import pytest

from super4pcs_tpu import Match4PCS, MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.api import register


def sphere_cloud(rng, n, radius=1.0):
    """Random cloud on the unit sphere with outward normals — the
    reference's generateSphereCloud fixture (ref:tests/testing.h:157-168)."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (v * radius).astype(np.float32)
    return pos, v.astype(np.float32)


def bumpy_cloud(rng, n):
    """Sphere with angular bumps — breaks the sphere's rotational
    symmetry so the registration has a unique solution."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
            + 0.2 * np.sin(4 * v[:, 2]))
    return (v * bump[:, None]).astype(np.float32)


def rot_tr_diff(got, expected):
    """Quaternion + translation distance as in ref:matching.cc:309-335."""
    def quat(m):
        r = m[:3, :3]
        t = np.trace(r)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            q = np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                          (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
        else:
            i = np.argmax(np.diag(r))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(max(r[i, i] - r[j, j] - r[k, k] + 1.0, 1e-12)) * 2
            q = np.zeros(4)
            q[0] = (r[k, j] - r[j, k]) / s
            q[i + 1] = 0.25 * s
            q[j + 1] = (r[j, i] + r[i, j]) / s
            q[k + 1] = (r[k, i] + r[i, k]) / s
        return q / np.linalg.norm(q)

    qa, qe = quat(got), quat(expected)
    rot_diff = min(np.linalg.norm(qa - qe), np.linalg.norm(qa + qe))
    tr_diff = np.linalg.norm(got[:3, 3] - expected[:3, 3]) / max(
        np.linalg.norm(expected[:3, 3]), 1.0)
    return rot_diff, tr_diff


def run_registration(matcher_cls, rng, make_transform, n=300,
                     delta=0.05, overlap=0.9):
    pos = bumpy_cloud(rng, n)
    mat = make_transform(max_translation=0.5)
    inv = np.linalg.inv(mat)
    # source = target moved by inv(mat); registering source onto target
    # must recover mat
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    # sample_size = n keeps both whole clouds: every base point has an
    # exact counterpart, so a correct pipeline must reach LCP ~ 1.
    # Capacities are set small-but-sufficient to keep CPU CI fast.
    opts = Options(delta=delta, sample_size=n, max_time_seconds=30,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=7).configure_overlap(overlap)
    matcher = matcher_cls(opts)
    res = matcher.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    return res, mat, pos, q_pos


@pytest.mark.parametrize("matcher_cls", [Match4PCS, MatchSuper4PCS])
def test_recovers_rigid_transform(matcher_cls, rng, make_transform):
    res, mat, pos, q_pos = run_registration(matcher_cls, rng,
                                            make_transform)
    assert res.improved
    assert res.score > 0.8, f"LCP too low: {res.score}"
    # transformed source must land on the target
    moved = q_pos @ res.transform[:3, :3].T + res.transform[:3, 3]
    d2 = ((moved[:, None, :] - pos[None, :, :]) ** 2).sum(-1).min(1)
    frac = (np.sqrt(d2) < 0.05).mean()
    assert frac > 0.8, f"only {frac:.2f} of points aligned"
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2, rot_diff       # ref:matching.cc:333
    assert tr_diff <= 0.1, tr_diff         # ref:matching.cc:334


def test_register_api(rng, make_transform):
    pos = bumpy_cloud(rng, 300)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    res = register(pos, q, overlap=0.9, delta=0.05, sample_size=300,
                   max_time_seconds=30)
    assert res.score > 0.7
    assert res.transformed_q is not None
    d2 = ((res.transformed_q.pos[:, None, :] - pos[None, :, :]) ** 2
          ).sum(-1).min(1)
    assert (np.sqrt(d2) < 0.05).mean() > 0.7


def test_empty_inputs_return_large_number():
    opts = Options(delta=0.1)
    matcher = MatchSuper4PCS(opts)
    res = matcher.compute_transformation(
        PointCloud(pos=np.zeros((0, 3))),
        PointCloud(pos=np.ones((5, 3))))
    assert res.score >= 1e8  # kLargeNumber contract (ref:hpp:69-70)


def test_visitor_stream(rng, make_transform):
    pos = bumpy_cloud(rng, 200)
    mat = make_transform()
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    calls = []

    class Recorder:
        def __call__(self, fraction, lcp, transform):
            calls.append((fraction, lcp, np.array(transform)))

        def needs_global_transformation(self):
            return True

    opts = Options(delta=0.05, sample_size=100, max_time_seconds=20,
                   bases_per_step=4).configure_overlap(0.9)
    MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q), visitor=Recorder())
    assert calls[0][0] == 0.0                       # loop-start callback
    assert any(f == -1.0 for f, _, _ in calls)      # improvement callbacks
    assert calls[-1][0] > 0.0
    # lcp is monotonically non-decreasing across the stream
    lcps = [l for _, l, _ in calls]
    assert all(b >= a - 1e-9 for a, b in zip(lcps, lcps[1:]))


def test_anytime_budget(rng):
    # overlap 0.2 -> ~24k trials; a tiny time budget must stop early
    pos = bumpy_cloud(rng, 300)
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=1,
                   bases_per_step=4).configure_overlap(0.2)
    matcher = MatchSuper4PCS(opts)
    res = matcher.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=pos.copy()))
    assert res.n_trials < matcher.number_of_trials


def test_use_full_time_budget_outlives_trial_estimate(rng):
    """With use_full_time_budget the search keeps going past the
    reference trial estimate until the wall-clock budget (or terminate
    threshold) is hit."""
    pos = bumpy_cloud(rng, 150)
    opts = Options(delta=0.05, sample_size=100, max_time_seconds=6,
                   bases_per_step=4, max_quads=256, max_candidates=256,
                   refine_iterations=0, use_full_time_budget=True,
                   random_seed=3).configure_overlap(0.9, 0.9999)
    # register against a rotated copy so LCP 1.0 never triggers the stop
    theta = 2.0
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1]], np.float32)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(
        PointCloud(pos=pos),
        PointCloud(pos=(pos @ rot.T + 2.0).astype(np.float32)))
    # overlap 0.9 -> tiny trial estimate; the flag must outlive it
    assert m.number_of_trials < 40
    assert (res.n_trials > m.number_of_trials
            or res.score > 0.9999)


def test_state_export(rng, make_transform):
    res, mat, pos, q = run_registration(MatchSuper4PCS, rng, make_transform,
                                        n=200)
    matcher = MatchSuper4PCS(Options(delta=0.05).configure_overlap(0.9))
    matcher.compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    state = matcher.export_state()
    assert state["trial"] > 0
    assert 0.0 <= state["best_lcp"] <= 1.0
    assert np.asarray(state["transform"]).shape == (4, 4)


def test_checkpoint_resume(rng, make_transform):
    """A run interrupted after one step and resumed from its exported
    state must match an uninterrupted run with the same seed (the
    reference's current_trial_ resume design, ref:hpp:236-258)."""
    pos = bumpy_cloud(rng, 200)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    P, Q = PointCloud(pos=pos), PointCloud(pos=q)
    opts = Options(delta=0.05, sample_size=200, max_time_seconds=60,
                   bases_per_step=4, max_quads=512, max_candidates=1024,
                   random_seed=9).configure_overlap(0.6, 0.999)

    # uninterrupted run
    full = MatchSuper4PCS(opts).compute_transformation(P, Q)

    # interrupted: stop after ~1 step by shrinking the trial budget
    m1 = MatchSuper4PCS(opts)
    m1._init(P, Q)
    m1.number_of_trials = 4
    m1._perform_steps(__import__(
        "super4pcs_tpu.visitor", fromlist=["DummyTransformVisitor"]
    ).DummyTransformVisitor())
    state = m1.export_state()
    assert state["trial"] >= 4

    # resume and finish
    resumed = MatchSuper4PCS(opts).compute_transformation(
        P, Q, resume_state=state)
    assert resumed.n_trials >= full.n_trials
    # the resumed search must reach the same quality
    assert abs(resumed.score - full.score) < 0.05


def test_part_in_whole_low_overlap(rng, make_transform):
    """BASELINE.md config 4 (ref:doc/Usage-Part-in-Whole.md): register a
    *part* (target P) against a transformed *whole* (source Q) with a
    low overlap estimate — every base drawn from the part must find its
    congruent counterpart inside the whole."""
    whole = bumpy_cloud(rng, 400)
    part = whole[whole[:, 0] > 0.15]          # spatial chunk of the whole
    assert 80 < len(part) < 300
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (whole @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    frac = len(part) / len(whole)
    opts = Options(delta=0.05, sample_size=400, max_time_seconds=60,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=13).configure_overlap(
                       0.8 * frac, terminate_threshold=0.95 * frac)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=part.copy()), PointCloud(pos=q))
    # LCP is over Q (the whole): perfect alignment scores ~ part fraction
    assert res.score > 0.7 * frac, (res.score, frac)
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (rot_diff, tr_diff)


def test_filtered_registration_normals_colors(rng, make_transform):
    """BASELINE.md config 3: registration with the normal-difference and
    color-distance pair filters active (ref:4pcs.cc:145-171 semantics)."""
    pos = bumpy_cloud(rng, 250)
    normal = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    rgb = (np.abs(pos) * 200).astype(np.float32)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    qn = (normal @ inv[:3, :3].T).astype(np.float32)

    opts = Options(delta=0.05, sample_size=250, max_time_seconds=30,
                   bases_per_step=8, max_quads=1024, max_candidates=2048,
                   max_normal_difference=20.0, max_color_distance=60.0,
                   random_seed=17).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos, normal=normal, rgb=rgb),
        PointCloud(pos=q, normal=qn, rgb=rgb))
    assert res.score > 0.8, res.score
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1


def test_register_api_mesh(rng, make_transform):
    """register(mesh=...) shards the bases axis (runs on the virtual
    8-device CPU mesh)."""
    from super4pcs_tpu.parallel import make_mesh
    pos = bumpy_cloud(rng, 150)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    res = register(pos, q, overlap=0.9, delta=0.05, sample_size=150,
                   max_time_seconds=30, mesh=make_mesh(),
                   options=Options(bases_per_step=8, max_quads=512,
                                   max_candidates=1024))
    assert res.score > 0.8


def test_similarity_registration_estimate_scale(rng, make_transform):
    """End-to-end MULTISCALE analog: recover a scaled rigid transform
    (scale 1.25) with estimate_scale=True."""
    pos = bumpy_cloud(rng, 80)
    s = 1.25
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)

    # without the distance filter every point pair is a candidate, so
    # quad counts are much higher than in rigid mode — size buffers up
    opts = Options(delta=0.04, sample_size=80, max_time_seconds=30,
                   bases_per_step=8, estimate_scale=True,
                   max_pairs=4096, max_quads=2048, max_candidates=8192,
                   random_seed=21).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert res.score > 0.8, res.score
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    d = np.linalg.norm(moved - pos, axis=1)
    assert np.median(d) < 0.04
    est_scale = np.linalg.norm(res.transform[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.05, est_scale


def test_partial_overlap_with_noise(rng, make_transform):
    """Realistic scan-matching case: two partial views sharing ~50% of
    the surface, with sensor noise at delta/3."""
    whole = bumpy_cloud(rng, 600)
    a = whole[whole[:, 0] < 0.35]                 # view A
    b = whole[whole[:, 0] > -0.35]                # view B (overlaps A)
    overlap_frac = len(np.intersect1d(
        np.nonzero(whole[:, 0] < 0.35)[0],
        np.nonzero(whole[:, 0] > -0.35)[0])) / max(len(b), 1)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (b @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q += rng.normal(scale=0.015, size=q.shape).astype(np.float32)

    opts = Options(delta=0.05, sample_size=len(b), max_time_seconds=45,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=29).configure_overlap(
                       0.5 * overlap_frac, terminate_threshold=0.999)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=a.copy()), PointCloud(pos=q))
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, res.score)


def test_refinement_improves_noisy_pose(rng, make_transform):
    """The guarded trimmed-ICP stage must lift (never lower) the LCP on
    a noisy registration."""
    pos = bumpy_cloud(rng, 250)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q += rng.normal(scale=0.012, size=q.shape).astype(np.float32)

    base = Options(delta=0.04, sample_size=250, max_time_seconds=30,
                   bases_per_step=8, max_quads=1024, max_candidates=2048,
                   random_seed=31).configure_overlap(0.6, 0.999)
    res_off = MatchSuper4PCS(base.replace(refine_iterations=0)) \
        .compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    res_on = MatchSuper4PCS(base.replace(refine_iterations=8)) \
        .compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    assert res_on.score >= res_off.score - 1e-6
    assert res_on.score > 0.7
    rot_diff, tr_diff = rot_tr_diff(res_on.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1


def test_search_delta_factor_coarse_search(rng, make_transform):
    """Coarse-search mode (Options.search_delta_factor > 1): the pair
    band / join radius / rms gate widen, but verification and the
    refinement stay exact at delta — so registration of a *sparsely
    subsampled* Q (few exact counterparts within delta of any base
    point) still recovers the pose within the reference thresholds."""
    pos = bumpy_cloud(rng, 800)
    keep = rng.choice(len(pos), 260, replace=False)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (pos[keep] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q += rng.normal(scale=0.008, size=q.shape).astype(np.float32)

    opts = Options(delta=0.025, sample_size=260, max_time_seconds=45,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=17, search_delta_factor=2.0,
                   ).configure_overlap(0.5, terminate_threshold=0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, res.score)


def test_search_escalation_on_trial_exhaustion(rng, make_transform):
    """Anytime cascade: when the trial estimate exhausts below the
    terminate threshold, the matcher rebuilds the search at
    ``search_escalation_factor`` (fresh trial estimate) instead of
    stopping, and the coarse pass + exact-delta refine still recover
    the pose."""
    pos = bumpy_cloud(rng, 500)
    keep = rng.choice(len(pos), 200, replace=False)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (pos[keep] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q += rng.normal(scale=0.008, size=q.shape).astype(np.float32)

    # terminate_threshold 1.0 is unreachable -> phase 1 always exhausts
    # its estimate and must escalate (the wall budget is ample)
    opts = Options(delta=0.025, sample_size=200, max_time_seconds=300,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=23, search_escalation_factor=2.0,
                   search_escalation_stages=1,   # pin the single rung
                   ).configure_overlap(0.9, terminate_threshold=1.0)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert res.stats.get("escalated_to") == 2.0
    # zero-blocking contract (VERDICT r3 #1): escalation swaps in a
    # program compiled on a worker thread concurrently with the search;
    # the anytime clock never pays for the compile
    assert res.stats["escalation_compile_seconds"] == 0.0
    assert res.stats["escalation_bg_compile_seconds"] > 0
    # escalated state round-trips through checkpoint export
    state = m.export_state()
    assert state["search_sf"] == 2.0
    assert state["budget_mult"] == 2
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, res.score)

    # resuming from the escalated checkpoint continues at the coarse
    # factor without re-running phase 1
    m2 = MatchSuper4PCS(opts)
    res2 = m2.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q), resume_state=state)
    assert m2._search_sf == 2.0
    assert res2.score >= res.score - 1e-6


def test_search_escalation_second_rung(rng, make_transform):
    """The escalation LADDER (VERDICT r4 #5): when the first escalated
    estimate also exhausts below the threshold, a second rung rebuilds
    at factor^2 with another budget extension — the failing-seed
    recourse the single-rung design lacked."""
    pos = bumpy_cloud(rng, 500)
    keep = rng.choice(len(pos), 200, replace=False)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q = (pos[keep] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    q += rng.normal(scale=0.008, size=q.shape).astype(np.float32)

    # noise keeps LCP < 1 and the threshold is unreachable, so every
    # rung exhausts its estimate; the ample wall budget lets the run
    # climb both rungs before the trial-stop fires
    opts = Options(delta=0.025, sample_size=200, max_time_seconds=600,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   random_seed=23, search_escalation_factor=2.0,
                   search_escalation_stages=2,
                   ).configure_overlap(0.9, terminate_threshold=1.0)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert res.stats.get("escalated_to") == 4.0     # rung 2 = factor^2
    assert m._budget_mult == 3                      # two extensions
    assert m._esc_stage == 2
    assert res.stats["escalation_compile_seconds"] == 0.0
    # quality still holds through the coarse rungs + guarded refine
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (
        rot_diff, tr_diff, res.score)


def test_cell_cap_pressure_does_not_hurt_quality(rng, make_transform):
    """Grid-join per-cell cap under real pressure: a cloud with tight
    clusters drives many invariant points into few cells, forcing
    per-cell drops at a small cell_candidates. The drops must be (a)
    counted in stats["cell_dropped"] and (b) quality-neutral — RANSAC
    needs one true congruent hit per good base, not all of them
    (VERDICT r1 weak #5)."""
    surface = bumpy_cloud(rng, 150)
    # dense clusters: 12 sites x 12 points within ~delta of each site
    sites = surface[rng.choice(len(surface), 12, replace=False)]
    blobs = (sites[:, None, :]
             + rng.normal(scale=0.02, size=(12, 12, 3))).reshape(-1, 3)
    pos = np.concatenate([surface, blobs]).astype(np.float32)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    # force_grid_join: at this nq the matcher would pick the dense
    # oracle join (exact, no per-cell caps) and the invariant under test
    # would never execute — the knob pins the grid path (VERDICT r2
    # weak #2)
    base = Options(delta=0.05, sample_size=len(pos), max_time_seconds=30,
                   bases_per_step=8, max_quads=4096, max_candidates=4096,
                   refine_iterations=0, force_grid_join=True,
                   random_seed=11).configure_overlap(0.9, 0.999)
    scores = {}
    dropped = {}
    for cap in (4, 64):
        res = MatchSuper4PCS(base.replace(cell_candidates=cap)) \
            .compute_transformation(PointCloud(pos=pos),
                                    PointCloud(pos=q_pos))
        scores[cap] = res.score
        dropped[cap] = res.stats["cell_dropped"]
    assert dropped[4] > 0, "fixture failed to pressure the per-cell cap"
    assert scores[64] > 0.85, scores
    # capped run must match the uncapped run's quality
    assert scores[4] >= scores[64] - 0.05, (scores, dropped)


def test_large_coordinate_extent_robustness(rng, make_transform):
    """Clouds far from the origin (offset 1e5) with a large extent (1e3)
    must register as well as unit-scale ones — the conditioning role the
    reference delegates to unit-cube normalization
    (ref:pairCreationFunctor.h:90-122). Here centroid centering
    (ref:hpp:141-149) plus scale-free cell quantization make the pipeline
    translation- and scale-invariant; this test pins that contract (see
    ops/pairs.py docstring for the documented divergence)."""
    scale, offset = 500.0, np.float32([1e5, -7e4, 5e4])
    pos = (bumpy_cloud(rng, 250) * scale + offset).astype(np.float32)
    mat = make_transform(max_translation=0.4 * scale)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    opts = Options(delta=0.05 * scale, sample_size=250,
                   max_time_seconds=30, bases_per_step=8, max_quads=2048,
                   max_candidates=4096,
                   random_seed=7).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert res.improved
    assert res.score > 0.8, res.score
    rot_diff, _ = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2, rot_diff
    # translation is judged by ALIGNMENT, not parameter identity: at a
    # 1e5 lever arm a sub-0.01-rad rotation residual (LCP-invisible —
    # the guarded refine cannot improve a pose already at LCP 1.0)
    # moves the decomposed t by hundreds while the clouds coincide to
    # a fraction of delta. Parameter-space tr comparison is
    # ill-conditioned exactly where this test operates.
    moved = q_pos @ res.transform[:3, :3].T + res.transform[:3, 3]
    med = float(np.median(np.linalg.norm(moved - pos, axis=1)))
    assert med < 0.5 * opts.delta, (med, opts.delta)


def test_healpix_direction_bins_registration(rng, make_transform):
    """End-to-end registration with the HEALPix direction index (the
    reference's IndexedNormalHealSet option, ref:normalHealSet.h:102-106)
    — must recover the pose within the same thresholds as cone mode."""
    pos = bumpy_cloud(rng, 250)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    opts = Options(delta=0.05, sample_size=250, max_time_seconds=30,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   direction_bins="healpix", healpix_nside=4,
                   random_seed=7).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert res.improved
    assert res.score > 0.8, res.score
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1


def test_phase_timing_breakdown(rng, make_transform):
    """opts.phase_timing=True surfaces a per-phase device-step table in
    stats (the reference's TEST_GLOBAL_TIMINGS analog)."""
    pos = bumpy_cloud(rng, 200)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    opts = Options(delta=0.05, sample_size=200, max_time_seconds=20,
                   bases_per_step=4, max_quads=512, max_candidates=1024,
                   random_seed=7, phase_timing=True).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    phases = res.stats["phase_seconds"]
    assert set(phases) == {"select_extract", "join", "fit", "verify",
                           "step_total"}
    assert all(v >= 0.0 for v in phases.values())
    assert phases["step_total"] > 0.0
    # telescoping consistency: prefix phases cannot exceed the total by
    # more than timing noise
    assert phases["select_extract"] <= phases["step_total"] * 3
    assert res.stats["initial_verify_seconds"] > 0.0
    assert res.improved
    # roofline attribution rides the same probes (VERDICT r3 #2): every
    # phase carries achieved rates, a bound class and the headroom
    roof = res.stats["phase_roofline"]
    assert set(roof) == {"select_extract", "join", "fit", "verify"}
    for r in roof.values():
        assert r["bound"] in ("compute", "memory", "dispatch")
        assert r["gflops"] >= 0.0 and r["gbps"] >= 0.0
        assert r["headroom_x"] > 0.0


def test_auto_bases_per_step(rng, make_transform):
    """bases_per_step=None derives the vmapped width from the sampled-Q
    size (64 at toy scale, 16 at large nq; rounded up to the mesh
    size), and a default-Options run registers end-to-end with the
    trial counter advancing in auto-width steps."""
    from super4pcs_tpu.matcher import resolve_bases_per_step

    o = Options()
    assert o.bases_per_step is None
    assert resolve_bases_per_step(o, 200) == 64
    assert resolve_bases_per_step(o, 4096) == 16
    assert resolve_bases_per_step(o, 200, mesh_size=24) == 72
    # explicit values are never overridden
    assert resolve_bases_per_step(o.replace(bases_per_step=8), 200) == 8

    pos = bumpy_cloud(rng, 150)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    opts = Options(delta=0.05, sample_size=150, max_time_seconds=30,
                   max_quads=512, max_candidates=1024,
                   random_seed=7).configure_overlap(0.9)
    assert opts.bases_per_step is None
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert m._b_eff == 64
    assert res.n_trials % 64 == 0
    assert res.improved and res.score > 0.8


def test_fused_dispatch_matches_unfused(rng, make_transform):
    """The fused K-step dispatch (matcher.build_multi_step) must explore
    THE SAME trials as the unfused anytime loop: per-step keys are
    fold_in(key, step_idx) in both, the in-device guarded polish applies
    the host loop's decision rule, and the early exit mirrors the host
    stop rules — so a fused run and an unfused run of one config land
    the same registration."""
    from super4pcs_tpu.matcher import resolve_steps_per_dispatch

    o = Options()
    assert resolve_steps_per_dispatch(o, 512) == 8      # toy scale
    assert resolve_steps_per_dispatch(o, 4096) == 1     # step-bound
    assert resolve_steps_per_dispatch(o, 512, mesh_size=4) == 1
    assert resolve_steps_per_dispatch(
        o.replace(search_delta_factor=2.0), 512) == 1

    pos = bumpy_cloud(rng, 150)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    base = Options(delta=0.05, sample_size=150, max_time_seconds=60,
                   max_quads=512, max_candidates=1024,
                   random_seed=7).configure_overlap(0.9)

    m_fused = MatchSuper4PCS(base)
    res_fused = m_fused.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert m_fused._multi_fn is not None        # fused path active

    m_plain = MatchSuper4PCS(base.replace(steps_per_dispatch=1))
    res_plain = m_plain.compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert m_plain._multi_fn is None            # per-step path active

    assert res_fused.n_trials == res_plain.n_trials
    assert abs(res_fused.score - res_plain.score) < 1e-3, (
        res_fused.score, res_plain.score)
    np.testing.assert_allclose(res_fused.transform, res_plain.transform,
                               atol=1e-3)


def test_fused_dispatch_visitor_contract(rng, make_transform):
    """Pin the documented fused-loop contract divergence (VERDICT r4
    #7, visitor.py / Options.steps_per_dispatch): fused dispatches
    COALESCE improvement callbacks — the host observes at most one
    improvement per dispatch, each a value the unfused per-step stream
    also produces — and both paths end at the same best."""

    class Recorder:
        def __init__(self):
            self.improvements = []
            self.fractions = []

        def __call__(self, fraction, best_lcp, transform):
            if fraction < 0:
                self.improvements.append(float(best_lcp))
            else:
                self.fractions.append(float(fraction))

        def needs_global_transformation(self):
            return False

    pos = bumpy_cloud(rng, 150)
    mat = make_transform(max_translation=0.4)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    base = Options(delta=0.05, sample_size=150, max_time_seconds=60,
                   max_quads=512, max_candidates=1024,
                   random_seed=7).configure_overlap(0.9)

    vis_f, vis_p = Recorder(), Recorder()
    res_f = MatchSuper4PCS(base).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos), visitor=vis_f)
    res_p = MatchSuper4PCS(
        base.replace(steps_per_dispatch=1)).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos), visitor=vis_p)

    # same registration either way (the result contract)
    assert abs(res_f.score - res_p.score) < 1e-3
    # both streams open with the fraction-0 call
    assert vis_f.fractions[0] == 0.0 and vis_p.fractions[0] == 0.0
    # coalescing: at most one improvement per dispatch — never more
    # callbacks than the per-step loop produces
    assert 1 <= len(vis_f.improvements) <= len(vis_p.improvements)
    # every coalesced improvement is a value the per-step stream also
    # reached (the dispatch boundary exposes the carried best, which
    # the unfused loop reports when it first adopts it)
    for v in vis_f.improvements:
        assert any(abs(v - u) < 1e-5 for u in vis_p.improvements), (
            v, vis_p.improvements)
    assert abs(vis_f.improvements[-1] - vis_p.improvements[-1]) < 1e-5


def test_similarity_refinement_recovers_scale(rng, make_transform):
    """In estimate_scale mode the trimmed ICP uses the Umeyama
    similarity fit: on a noisy scaled pair the guarded refine lifts the
    LCP and the recovered scale stays exact."""
    s = 1.7
    pos = bumpy_cloud(rng, 160)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)
    q += rng.normal(scale=0.01, size=q.shape).astype(np.float32)

    base = Options(delta=0.04, sample_size=160, max_time_seconds=40,
                   bases_per_step=8, estimate_scale=True,
                   max_pairs=8192, max_quads=2048, max_candidates=8192,
                   random_seed=21).configure_overlap(0.6, 0.999)
    res_off = MatchSuper4PCS(base.replace(refine_iterations=0)) \
        .compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    res_on = MatchSuper4PCS(base.replace(refine_iterations=8)) \
        .compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    # guarded: never lower; on noisy data the similarity ICP should win
    assert res_on.score >= res_off.score - 1e-6
    assert res_on.score > 0.8, (res_on.score, res_off.score)
    est_scale = np.linalg.norm(res_on.transform[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.05, est_scale
    moved = q @ res_on.transform[:3, :3].T + res_on.transform[:3, 3]
    assert np.median(np.linalg.norm(moved - pos, axis=1)) < 0.04


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/assets/hippo1.obj"),
    reason="hippo asset unavailable")
def test_mode_parity_pose_hippo():
    """BASELINE.md config 2: the quadratic 4PCS mode (CLI -x) and the
    Super4PCS smart-indexing mode must land on the SAME pose for the
    hippo demo pair, within the reference regression thresholds
    (rot <= 0.2, tr <= 0.1 — ref:tests/matching.cc:333-335). No ground
    truth exists for hippo; cross-mode agreement is the reference's own
    quad_extraction intent (ref:tests/quad_extraction.cc:66-155)."""
    from super4pcs_tpu.io import read_object
    set1, _ = read_object("/root/reference/assets/hippo1.obj")
    set2, _ = read_object("/root/reference/assets/hippo2.obj")
    opts = (Options(delta=0.01, sample_size=200, max_time_seconds=120,
                    random_seed=5)
            .configure_overlap(0.7, terminate_threshold=0.7))
    r_super = MatchSuper4PCS(opts).compute_transformation(set1, set2)
    r_4pcs = Match4PCS(opts).compute_transformation(set1, set2)
    assert r_super.score >= 0.7 and r_4pcs.score >= 0.7, (
        r_super.score, r_4pcs.score)
    rot_diff, tr_diff = rot_tr_diff(r_4pcs.transform, r_super.transform)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (rot_diff, tr_diff)


def test_scale_mode_allpairs_engine(rng, make_transform):
    """The large-nq scale-mode engine ("allpairs": the congruent join
    reads the IMPLICIT full ordered-pair enumeration — zero capture
    loss, zero extraction; see ops/congruent.py allpairs_cols), forced
    at small nq so CPU CI covers the whole path: implicit table +
    broadcast hash columns + rotated strided Q-side sampling
    (q_uniform). Validated at nq=2500 on TPU — the size where capped
    capture measurably fails (BASELINE.md r3)."""
    s = 1.4
    pos = bumpy_cloud(rng, 96)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)

    opts = Options(delta=0.04, sample_size=96, max_time_seconds=60,
                   bases_per_step=8, estimate_scale=True,
                   pair_engine="allpairs", max_quads=2048,
                   max_candidates=8192,
                   random_seed=21).configure_overlap(0.8, 0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    assert res.score > 0.8, res.score
    est_scale = np.linalg.norm(res.transform[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.05, est_scale
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    assert np.median(np.linalg.norm(moved - pos, axis=1)) < 0.04

    # the engine is scale-mode-only (no pair-distance predicate exists
    # in the join), and auto picks it above the dense ceiling
    from super4pcs_tpu.matcher import resolve_pair_engine
    base = Options(estimate_scale=True)
    assert resolve_pair_engine(base, 1024) == "dense"
    assert resolve_pair_engine(base, 4096) == "allpairs"
    with pytest.raises(ValueError):
        Options(pair_engine="allpairs")


def test_scale_mode_q_ceiling(rng, make_transform):
    """estimate_scale enforces the documented Q-sample ceiling
    (Options.scale_max_q): with the distance filter off the pair space
    is nq^2 — a capped CAPTURE loses the true (pair1, pair2) joint
    (measured to fail outright at nq=2500, VERDICT r2 weak #7; the
    allpairs engine now removes the capture and registers there —
    BASELINE.md r3 — so the ceiling bounds nq^2 step COST, not
    correctness). The matcher truncates Q to the ceiling (counted in
    stats) and still recovers pose AND scale on the truncated sample."""
    s = 1.4
    pos = bumpy_cloud(rng, 2500)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)
    q += rng.normal(scale=0.008, size=q.shape).astype(np.float32)

    # ceiling overridden small to keep CPU CI fast — the contract under
    # test is the cap + telemetry + registration on the capped sample
    opts = Options(delta=0.05, sample_size=2500, max_time_seconds=60,
                   bases_per_step=8, estimate_scale=True,
                   scale_hierarchical=False,   # pin the truncate path
                   scale_max_q=192, max_quads=2048, max_candidates=8192,
                   random_seed=21).configure_overlap(0.6, 0.9)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    assert len(m.get_second_sampled()) <= 192
    assert res.stats["scale_q_capped"] == 2500 - 192
    assert res.score > 0.7, res.score
    est_scale = np.linalg.norm(res.transform[:3, :3], axis=0).mean()
    assert abs(est_scale - s) < 0.07, est_scale
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    assert np.median(np.linalg.norm(moved - pos, axis=1)) < 0.05


def test_scale_hierarchical_registration(rng, make_transform):
    """Hierarchical scale mode (Options.scale_hierarchical, VERDICT r4
    #8): above scale_max_q the matcher solves scale COARSE at the
    ceiling, rescales Q, and registers RIGID at full resolution on the
    fast banded path — composed similarity, sub-0.5%-class scale error,
    full-sample LCP. The ceiling stops truncating Q."""
    s = 1.4
    pos = bumpy_cloud(rng, 900)
    mat = make_transform(max_translation=0.3)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)
    q += rng.normal(scale=0.006, size=q.shape).astype(np.float32)

    opts = Options(delta=0.04, sample_size=900, max_time_seconds=120,
                   bases_per_step=8, estimate_scale=True,
                   scale_max_q=256, max_quads=2048, max_candidates=8192,
                   random_seed=21).configure_overlap(0.6, 0.9)
    m = MatchSuper4PCS(opts)
    res = m.compute_transformation(PointCloud(pos=pos), PointCloud(pos=q))
    assert "hierarchical_scale" in res.stats
    assert "scale_q_capped" not in res.stats       # no truncation
    assert res.score > 0.8, (res.score, res.stats)
    est_scale = np.linalg.norm(res.transform[:3, :3], axis=0).mean()
    assert abs(est_scale - s) / s < 0.01, est_scale
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    assert np.median(np.linalg.norm(moved - pos, axis=1)) < 0.04


def test_banded_engine_registration(rng, make_transform):
    """End-to-end registration through the banded pair engine (forced
    via Options.pair_engine — auto picks it only at nq > 32768, far too
    big for CPU CI). At this scale the band fits the window entirely
    and the expansion is exact, so quality must match the dense-engine
    contract (VERDICT r2 missing #2: the output-sensitive engine must
    be a real registration path, not just an op with parity tests)."""
    res, mat, pos, q_pos = run_registration(
        lambda o: MatchSuper4PCS(o.replace(pair_engine="banded")),
        rng, make_transform)
    assert res.improved
    assert res.score > 0.8, f"LCP too low: {res.score}"
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (rot_diff, tr_diff)


def test_banded_engine_overflow_pressure(rng, make_transform):
    """Banded engine under deliberate window + expansion pressure: a
    tiny band_cell_pair_cap / band_expand_cap force band overflow, and
    registration must still succeed because (a) the window strides the
    WHOLE band uniformly (not one contiguous center-distance slice —
    the r3 bug that collapsed nq=32768 to LCP 0.028) and (b) per-trial
    rotation decorrelates which candidates are examined. Drops must be
    counted in stats["pairs_overflow"]."""
    pos = bumpy_cloud(rng, 300)
    mat = make_transform(max_translation=0.5)
    inv = np.linalg.inv(mat)
    q_pos = (pos @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    # 120 s wall: success here rides a late escalation (the capped
    # band drops most true pairs at factor 1), and a loaded 1-core CI
    # host stretches step+compile latency ~2x — a 60 s budget made
    # the pass timing-dependent (flaked in-suite, passed isolated)
    opts = Options(delta=0.05, sample_size=300, max_time_seconds=120,
                   bases_per_step=8, max_quads=2048, max_candidates=4096,
                   pair_engine="banded", band_cell_pair_cap=128,
                   band_expand_cap=2048,
                   random_seed=7).configure_overlap(0.9)
    res = MatchSuper4PCS(opts).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q_pos))
    assert res.stats["pairs_overflow"] > 0, \
        "fixture failed to pressure the band window"
    assert res.score > 0.8, (res.score, res.stats["pairs_overflow"])
    rot_diff, tr_diff = rot_tr_diff(res.transform, mat)
    assert rot_diff <= 0.2 and tr_diff <= 0.1, (rot_diff, tr_diff)
