"""Uniform-distance (voxel grid) decimation.

TPU-native equivalent of ``Sampling::UniformDistSampler``
(ref:src/super4pcs/sampling.h:59-121): the reference dedups points into
``floor(p / delta)`` voxels through a linear-probed hash table, keeping
the *first* point that lands in each voxel. Here the same semantics fall
out of a sorted ``unique`` over quantized int keys — no probing, no
magic-prime hash, and exact (the reference hash can alias distinct
voxels only on 64-bit collisions; unique keys cannot).

Sampling runs once per registration on the host (numpy); it is
IO-adjacent, not a hot loop.
"""

from __future__ import annotations

import numpy as np

from ..cloud import PointCloud


def voxel_indices(pos: np.ndarray, voxel: float) -> np.ndarray:
    """Indices of the first point in each occupied voxel, in input order.

    Matches the keep-first-per-voxel rule of
    ref:sampling.h:105-121 (``if (ind >= num_input) output.push_back``).
    """
    if voxel <= 0:
        raise ValueError(f"voxel size must be > 0, got {voxel}")
    cells = np.floor(pos.astype(np.float64) / voxel).astype(np.int64)
    lo = cells.min(axis=0, initial=0) if len(cells) else np.zeros(3, np.int64)
    span = cells.max(axis=0, initial=0) - lo if len(cells) else lo
    if (span < (1 << 21)).all():
        # pack the 3 cell coordinates into one int64 (21 bits/axis —
        # collision-free given the span guard): 1-D unique is ~15x
        # faster than row-wise unique at 10^6 points (2.3 s -> 0.15 s)
        packed = (((cells[:, 0] - lo[0]) << 42)
                  | ((cells[:, 1] - lo[1]) << 21)
                  | (cells[:, 2] - lo[2]))
        _, first = np.unique(packed, return_index=True)
    else:
        # degenerate voxel/extent ratio: exact row-wise unique
        _, first = np.unique(cells, axis=0, return_index=True)
    first.sort()
    return first


def uniform_dist_sample(cloud: PointCloud, delta: float) -> PointCloud:
    """Voxel-grid decimation at resolution ``delta``."""
    return cloud.take(voxel_indices(cloud.pos, delta))


def sample_for_matching(
    cloud: PointCloud,
    delta: float,
    sample_size: int,
    truncate: bool,
    rng: np.random.Generator | None = None,
) -> PointCloud:
    """Sampling policy of ``Match4PCSBase::init``
    (ref:algorithms/match4pcsBase.hpp:112-138):

    - if the cloud has <= sample_size points, use it whole (the
      reference logs "More samples requested than available");
    - otherwise voxel-decimate at ``delta``;
    - with ``truncate=True`` (the Q side, ref:hpp:129-132) additionally
      shuffle and keep sample_size points. The P side keeps the full
      voxel-sampled set (``truncate=False``).
    """
    if len(cloud) <= sample_size:
        return cloud
    sampled = uniform_dist_sample(cloud, delta)
    if not truncate or len(sampled) <= sample_size:
        return sampled
    if rng is None:
        rng = np.random.default_rng(0)
    perm = rng.permutation(len(sampled))[:sample_size]
    return sampled.take(perm)


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of ``x`` so consecutive bits land 3 apart
    (the classic Morton bit-interleave expansion)."""
    x = x.astype(np.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_argsort(pos: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation ordering points along a 3-D Morton (Z-order) curve.

    Spatial locality in MEMORY order is what makes the Pallas capture
    kernel's tile rejection fire (kernels/rowcap_pallas.py): after this
    ordering, consecutive index ranges are spatially compact, so a
    (row-tile, col-tile) bounding-sphere test prunes most of the
    Theta(nq^2) band sweep. Any fixed permutation of Q is semantically
    transparent to the matcher (RANSAC draws by index; outputs are
    transforms), so this is applied unconditionally in matcher._init.
    """
    p = np.asarray(pos, np.float64)
    lo = p.min(axis=0)
    span = float(max(np.ptp(p, axis=0).max(), 1e-30))
    g = np.minimum(((p - lo) / span * ((1 << bits) - 1)).astype(np.int64),
                   (1 << bits) - 1).astype(np.uint32)
    code = ((_part1by2(g[:, 2]) << 2) | (_part1by2(g[:, 1]) << 1)
            | _part1by2(g[:, 0]))
    return np.argsort(code, kind="stable")


def kd_argsort(pos: np.ndarray, leaf: int = 256) -> np.ndarray:
    """Permutation ordering points by recursive longest-axis median
    splits (a balanced kd-tree traversal order).

    Like :func:`morton_argsort` this is a pure performance heuristic —
    any fixed permutation is semantically transparent to the matcher —
    but its ``leaf``-point blocks are compact kd cells by construction
    (no Z-curve discontinuities), which roughly doubles the Pallas
    kernel's tile-pair band rejection rate (measured at nq=32768:
    15-53% of tile pairs rejected per base edge vs Morton's 3-29%;
    nq=65536: 35-68%). ``leaf`` matches the kernel's ROW_TILE so each
    row tile IS one kd cell.
    """
    pos_ = np.asarray(pos, np.float64)
    n = len(pos_)
    out = np.empty(n, np.int64)

    def rec(ids, lo):
        if len(ids) <= leaf:
            out[lo:lo + len(ids)] = ids
            return
        p = pos_[ids]
        ax = int(np.argmax(p.max(axis=0) - p.min(axis=0)))
        k = len(ids) // 2
        part = np.argpartition(p[:, ax], k)
        rec(ids[part[:k]], lo)
        rec(ids[part[k:]], lo + k)

    rec(np.arange(n), 0)
    return out
