"""CLI surface tests: flags, exit codes, outputs
(ref:demos/Super4PCS/super4pcs_test.cc:66-99, demos/demo-utils.h:119-162).
"""

import numpy as np
import pytest

from super4pcs_tpu import cli
from super4pcs_tpu.io import read_object, write_ply
from super4pcs_tpu.cloud import PointCloud


def make_cloud_files(tmp_path, rng, n=120):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = 1.0 + 0.3 * np.sin(5 * v[:, 0]) + 0.2 * np.sin(4 * v[:, 2])
    pos = (v * bump[:, None]).astype(np.float32)
    ang = 0.8
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0],
                    [0, 0, 1]], np.float32)
    q = (pos - np.float32([0.2, 0.1, -0.3])) @ rot
    p1 = tmp_path / "p.ply"
    p2 = tmp_path / "q.ply"
    write_ply(str(p1), PointCloud(pos=pos))
    write_ply(str(p2), PointCloud(pos=q))
    return str(p1), str(p2), pos


def test_usage_exit_code():
    assert cli.main(["super4pcs"]) == -2
    assert cli.main(["super4pcs", "-i", "a"]) == -2


def test_unknown_flag_exit_code(tmp_path):
    assert cli.main(["super4pcs", "-i", "a", "b", "--bogus"]) == 0 or True
    # unknown flag -> usage printed, exit 0 per reference quirk
    # (getArgs returns -1 but main exits max(c,0)=0 after printing,
    #  ref:super4pcs_test.cc:70-74)
    rc = cli.main(["super4pcs", "-i", "a", "b", "--bogus"])
    assert rc == 0


def test_read_failure_exit_code(tmp_path):
    rc = cli.main(["super4pcs", "-i", str(tmp_path / "missing1.ply"),
                   str(tmp_path / "missing2.ply")])
    assert rc == -1


def test_bad_overlap_exit_code(tmp_path, rng):
    p1, p2, _ = make_cloud_files(tmp_path, rng)
    rc = cli.main(["super4pcs", "-i", p1, p2, "-o", "1.5"])
    assert rc == -3


def test_end_to_end_outputs(tmp_path, rng, capsys):
    p1, p2, pos = make_cloud_files(tmp_path, rng)
    out_geo = tmp_path / "reg.ply"
    out_mat = tmp_path / "mat.txt"
    rc = cli.main(["super4pcs", "-i", p1, p2,
                   "-o", "0.9", "-d", "0.05", "-n", "120", "-t", "20",
                   "-r", str(out_geo), "-m", str(out_mat)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Score:" in captured.out
    # registered geometry lands near the target
    moved, _ = read_object(str(out_geo))
    d2 = ((moved.pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1).min(1)
    assert (np.sqrt(d2) < 0.05).mean() > 0.9
    # matrix file is Polyworks format
    text = (tmp_path / "mat.txt").read_text()
    assert text.startswith("VERSION\t=\t1\nMATRIX\t=\n")
    assert len(text.strip().splitlines()) == 6


def test_4pcs_mode_flag(tmp_path, rng, capsys):
    p1, p2, pos = make_cloud_files(tmp_path, rng, n=80)
    rc = cli.main(["super4pcs", "-i", p1, p2, "-x",
                   "-o", "0.9", "-d", "0.05", "-n", "80", "-t", "15",
                   "-m", str(tmp_path / "m.txt")])
    assert rc == 0
    assert "Use old 4PCS" in capsys.readouterr().out


def test_sampled_cloud_exports(tmp_path, rng):
    p1, p2, pos = make_cloud_files(tmp_path, rng, n=100)
    s1 = tmp_path / "s1.ply"
    s2 = tmp_path / "s2.ply"
    rc = cli.main(["super4pcs", "-i", p1, p2,
                   "-o", "0.9", "-d", "0.05", "-n", "100", "-t", "10",
                   "-m", str(tmp_path / "m.txt"),
                   "--sampled1", str(s1), "--sampled2", str(s2)])
    assert rc == 0
    c1, _ = read_object(str(s1))
    c2, _ = read_object(str(s2))
    assert 0 < len(c1) <= 100 and 0 < len(c2) <= 100


def test_invalid_flag_value_no_traceback():
    """Non-numeric flag values exit through the usage path, not a
    Python traceback."""
    rc = cli.main(["super4pcs", "-i", "a.ply", "b.ply", "-o", "abc"])
    assert rc == 0   # same path as unknown flag (ref exits max(c,0))


def test_tpu_opts_parsing():
    """--tpu-opts spec parses by Options field type; unknown keys and
    bad values raise (routed through the usage path by get_args)."""
    got = cli.parse_tpu_opts(
        "bases_per_step=32, pair_row_cap=96,use_full_time_budget=true,"
        "direction_bins=healpix,join_q_budget=none,"
        "cone_cos_tolerance=0.25")
    assert got == {"bases_per_step": 32, "pair_row_cap": 96,
                   "use_full_time_budget": True,
                   "direction_bins": "healpix", "join_q_budget": None,
                   "cone_cos_tolerance": 0.25}
    # bases_per_step is Optional since the auto-width default: "none"
    # restores the auto derivation
    assert cli.parse_tpu_opts("bases_per_step=none") == {
        "bases_per_step": None}
    for bad in ("delta=1",            # reference flag, not a TPU knob
                "nope=3", "bases_per_step", "phase_timing=maybe",
                "refine_iterations=none"):
        with pytest.raises(ValueError):
            cli.parse_tpu_opts(bad)
    # bad spec exits through the usage path, no traceback
    rc = cli.main(["super4pcs", "-i", "a.ply", "b.ply",
                   "--tpu-opts", "delta=1"])
    assert rc == 0


def test_tpu_opts_end_to_end(tmp_path, rng, capsys):
    """Knobs set via --tpu-opts reach the matcher Options."""
    p1, p2, _ = make_cloud_files(tmp_path, rng, n=80)
    rc = cli.main(["super4pcs", "-i", p1, p2,
                   "-o", "0.9", "-d", "0.05", "-n", "80", "-t", "15",
                   "-m", str(tmp_path / "m.txt"),
                   "--tpu-opts", "bases_per_step=8,random_seed=3"])
    assert rc == 0
    assert "Score:" in capsys.readouterr().out
