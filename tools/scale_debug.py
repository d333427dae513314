"""Debug harness for estimate_scale (similarity / MULTISCALE) mode.

Replicates tests/test_matcher.py::test_similarity_refinement_recovers_scale
with telemetry printed, on CPU for fast iteration.
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")
from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud


def bumpy_cloud(rng, n):
    # exact copy of tests/test_matcher.py::bumpy_cloud
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
            + 0.2 * np.sin(4 * v[:, 2]))
    return (v * bump[:, None]).astype(np.float32)


def make_transform(rng, max_translation=0.3):
    # exact copy of tests/conftest.py::random_rigid_transform
    a = rng.normal(size=(3, 3))
    qm, r = np.linalg.qr(a)
    qm = qm * np.sign(np.diag(r))
    if np.linalg.det(qm) < 0:
        qm[:, 0] = -qm[:, 0]
    mat = np.eye(4, dtype=np.float64)
    mat[:3, :3] = qm
    mat[:3, 3] = rng.uniform(-max_translation, max_translation, size=3)
    return mat.astype(np.float32)


def main():
    rng = np.random.default_rng(42)
    s = 1.7
    pos = bumpy_cloud(rng, 160)
    mat = make_transform(rng)
    inv = np.linalg.inv(mat)
    q = ((pos @ inv[:3, :3].T + inv[:3, 3]) / s).astype(np.float32)
    q += rng.normal(scale=0.01, size=q.shape).astype(np.float32)

    base = Options(delta=0.04, sample_size=160, max_time_seconds=40,
                   bases_per_step=8, estimate_scale=True,
                   max_pairs=8192, max_quads=2048, max_candidates=8192,
                   random_seed=21).configure_overlap(0.6, 0.999)
    res = MatchSuper4PCS(base).compute_transformation(
        PointCloud(pos=pos), PointCloud(pos=q))
    print("score:", res.score, "trials:", res.n_trials)
    print("stats:", {k: v for k, v in res.stats.items()
                     if not k.endswith("seconds")})
    est_scale = np.linalg.norm(res.transform[:3, :3], axis=0).mean()
    print("est_scale:", est_scale)
    moved = q @ res.transform[:3, :3].T + res.transform[:3, 3]
    print("median err:", np.median(np.linalg.norm(moved - pos, axis=1)))


if __name__ == "__main__":
    main()
