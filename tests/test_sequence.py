"""Stanford-sequence harness tests — the rebuild analog of the
reference's matching_0/1 integration tests (ref:tests/matching.cc):
.conf parsing, merged-set incremental protocol, and the published
rot/tr thresholds (rotDiff <= 0.2, trDiff <= 0.1, sum <= 0.2,
ref:matching.cc:333-335). Real bunny/armadillo data is unavailable
in-image (zero egress); synthetic multi-view sequences and hippo-derived
views exercise the same harness."""

import os

import numpy as np
import pytest

from super4pcs_tpu import (Options, PointCloud, parse_stanford_conf,
                           reference_pose_diff, register_sequence)

HIPPO1 = "/root/reference/assets/hippo1.obj"


def axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return (np.cos(angle / 2), *(axis * np.sin(angle / 2)))


def quat_rot(w, x, y, z):
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def make_gt(quats, trs):
    """Conf-semantics transforms: T(p) = R (p - t)."""
    mats = []
    for (w, x, y, z), t in zip(quats, trs):
        rot = quat_rot(w, x, y, z)
        m = np.eye(4)
        m[:3, :3] = rot
        m[:3, 3] = -rot @ np.asarray(t, np.float64)
        mats.append(m.astype(np.float32))
    return mats


def test_conf_parser_semantics(tmp_path):
    """T = rotate(q) . translate(-t), quaternion tokens x y z w with w
    last (ref:matching.cc:175-193)."""
    w, x, y, z = axis_angle_quat([0, 0, 1], 0.5)
    conf = tmp_path / "seq.conf"
    conf.write_text(
        "camera 0 0 0 0 0 0 1\n"
        f"bmesh scan0.ply 0 0 0 0 0 0 1\n"
        f"bmesh scan1.ply 0.1 -0.2 0.3 {x} {y} {z} {w}\n"
        "junkline that should be ignored\n")
    files, mats = parse_stanford_conf(str(conf))
    assert [os.path.basename(f) for f in files] == ["scan0.ply", "scan1.ply"]
    np.testing.assert_allclose(mats[0], np.eye(4), atol=1e-7)
    p = np.array([0.4, 0.5, 0.6])
    t = np.array([0.1, -0.2, 0.3])
    want = quat_rot(w, x, y, z) @ (p - t)
    got = mats[1][:3, :3] @ p + mats[1][:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_reference_pose_diff_inversion_insensitive():
    """The reference metric compares component-wise absolute
    quaternions, so a transform and its inverse score identically
    (ref:matching.cc:326) — the property its merged-set protocol
    relies on."""
    w, x, y, z = axis_angle_quat([1, 2, 3], 0.8)
    rot = quat_rot(w, x, y, z)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = rot
    m[:3, 3] = [0.05, -0.02, 0.01]
    rot_diff, _ = reference_pose_diff(np.linalg.inv(m), m)
    assert rot_diff < 1e-5
    rot_diff2, _ = reference_pose_diff(m, m)
    assert rot_diff2 < 1e-6


def bumpy_cloud(rng, n):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
            + 0.2 * np.sin(4 * v[:, 2]))
    return (v * bump[:, None]).astype(np.float32)


def slab_views(model, starts, width):
    """Overlapping axis-aligned slabs of the model (scan windows)."""
    views = []
    x = model[:, 0]
    lo, hi = x.min(), x.max()
    for s in starts:
        a = lo + s * (hi - lo)
        b = a + width * (hi - lo)
        views.append(model[(x >= a) & (x <= b)])
    return views

def make_sequence(model, starts, width, quats, trs):
    """Scans in their own frames: scan_k = A_k(view_k) with
    A_k = conf-GT transform (so inv(A_k) places them back)."""
    gts = make_gt(quats, trs)
    views = slab_views(model, starts, width)
    scans = []
    for v, m in zip(views, gts):
        scans.append(PointCloud(
            pos=(v @ m[:3, :3].T + m[:3, 3]).astype(np.float32)))
    return scans, gts


SEQ_QUATS = [axis_angle_quat([0, 0, 1], 0.0),
             axis_angle_quat([0, 1, 0], 0.9),
             axis_angle_quat([1, 0, 1], -0.7),
             axis_angle_quat([1, 1, 0], 1.3)]
SEQ_TRS = [[0, 0, 0], [0.10, -0.05, 0.08], [-0.07, 0.12, 0.02],
           [0.04, 0.06, -0.11]]


def test_synthetic_sequence_merged_set(rng):
    """4-view synthetic sequence, GT mode: every step must meet the
    reference thresholds (ref:matching.cc:333-335).

    View windows mirror the reference test's regime (bunny scans 45
    degrees apart, overlap config 0.7-0.8): each view covers ~65% of
    the model and consecutive views share ~75% — NOT small disjoint
    slabs, which neither this rebuild nor the reference's wide-base
    RANSAC is specified to solve within the trial estimate."""
    model = bumpy_cloud(rng, 4000)
    scans, gts = make_sequence(model, [0.0, 0.15, 0.3, 0.35], 0.65,
                               SEQ_QUATS, SEQ_TRS)
    assert all(len(s) > 400 for s in scans)
    # p_sample_budget pins the P shape: the growing merged set reuses
    # ONE compiled step program instead of recompiling per scan
    opts = Options(delta=0.03, sample_size=300, max_time_seconds=90,
                   bases_per_step=16, max_quads=2048, max_candidates=4096,
                   p_sample_budget=1024,
                   random_seed=5).configure_overlap(0.5, 0.6)
    steps = register_sequence(scans, opts, gt_transforms=gts)
    assert len(steps) == 3
    for st in steps:
        assert st.result.improved, f"step {st.index} did not improve"
        assert st.rot_diff <= 0.2, (st.index, st.rot_diff)
        assert st.tr_diff <= 0.1, (st.index, st.tr_diff)
        assert st.rot_diff + st.tr_diff <= 0.2, (st.index,)


def test_sequence_estimated_mode(rng):
    """Without GT the merged set is placed by the estimated poses —
    end-to-end odometry must still land every scan near the model."""
    model = bumpy_cloud(rng, 3000)
    scans, gts = make_sequence(model, [0.0, 0.15, 0.3], 0.65,
                               SEQ_QUATS[:3], SEQ_TRS[:3])
    opts = Options(delta=0.03, sample_size=300, max_time_seconds=90,
                   bases_per_step=16, max_quads=2048, max_candidates=4096,
                   p_sample_budget=1024,
                   random_seed=5).configure_overlap(0.5, 0.6)
    steps = register_sequence(scans, opts)
    assert all(st.result.improved for st in steps)
    # accumulate: scan k placed by est transforms must lie on the model
    for st, scan in zip(steps, scans[1:]):
        moved = scan.transformed(st.transform)
        d2 = ((moved.pos[:, None, :] - model[None, :, :]) ** 2).sum(-1)
        frac = (np.sqrt(d2.min(1)) < 0.05).mean()
        assert frac > 0.6, (st.index, frac)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(HIPPO1),
                    reason="hippo asset unavailable")
def test_hippo_conf_sequence_end_to_end(tmp_path, rng):
    """Full harness on hippo-derived views: write scans + .conf to
    disk, parse, register, check reference thresholds."""
    from super4pcs_tpu.io import read_object, write_ply
    model, _ = read_object(HIPPO1)
    pos = model.pos.astype(np.float32)
    scans, _gts = make_sequence(pos, [0.0, 0.15, 0.3, 0.35], 0.65,
                                SEQ_QUATS, SEQ_TRS)
    lines = []
    for k, (scan, (qw, qx, qy, qz), _t) in enumerate(
            zip(scans, SEQ_QUATS, SEQ_TRS)):
        name = f"scan{k}.ply"
        write_ply(str(tmp_path / name), scan)
        # conf encodes T=[R|-Rt]: recover t = -R^T translation
        m = make_gt([SEQ_QUATS[k]], [SEQ_TRS[k]])[0].astype(np.float64)
        t = -m[:3, :3].T @ m[:3, 3]
        lines.append(f"bmesh {name} {t[0]} {t[1]} {t[2]} "
                     f"{qx} {qy} {qz} {qw}")
    conf = tmp_path / "hippo.conf"
    conf.write_text("\n".join(lines) + "\n")

    files, gts = parse_stanford_conf(str(conf))
    assert len(files) == 4
    for k in range(4):
        np.testing.assert_allclose(
            gts[k], make_gt([SEQ_QUATS[k]], [SEQ_TRS[k]])[0], atol=1e-6)

    opts = Options(delta=0.01, sample_size=300, max_time_seconds=120,
                   bases_per_step=16, p_sample_budget=4096, random_seed=3
                   ).configure_overlap(0.5, 0.6)
    steps = register_sequence(files, opts, gt_transforms=gts)
    for st in steps:
        assert st.rot_diff <= 0.2, (st.index, st.rot_diff)
        assert st.tr_diff <= 0.1, (st.index, st.tr_diff)
        assert st.rot_diff + st.tr_diff <= 0.2, (st.index,)
