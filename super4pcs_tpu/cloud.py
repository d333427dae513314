"""Struct-of-arrays point cloud.

TPU-native equivalent of ``std::vector<Point3D>``
(ref:src/super4pcs/shared4pcs.h:61-111): positions, normals and colors
live in dense ``(N, 3)`` float32 arrays instead of an array of structs,
so every kernel sees contiguous, tileable data.

Conventions carried over from the reference:
- missing normals are zero vectors (``Point3D::normal_`` default),
- missing colors are ``(-1, -1, -1)`` and ``has_color`` mirrors
  ``Point3D::hasColor`` (squaredNorm > 0.001, ref:shared4pcs.h:92).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class PointCloud:
    pos: np.ndarray                  # (N, 3) float32
    normal: Optional[np.ndarray] = None   # (N, 3) float32 or None
    rgb: Optional[np.ndarray] = None      # (N, 3) float32 or None

    def __post_init__(self):
        self.pos = np.ascontiguousarray(self.pos, dtype=np.float32)
        if self.pos.ndim != 2 or self.pos.shape[1] != 3:
            raise ValueError(f"pos must be (N, 3), got {self.pos.shape}")
        n = self.pos.shape[0]
        if self.normal is not None:
            self.normal = np.ascontiguousarray(self.normal, dtype=np.float32)
            if self.normal.shape != (n, 3):
                raise ValueError(
                    f"normal must be ({n}, 3), got {self.normal.shape}")
        if self.rgb is not None:
            self.rgb = np.ascontiguousarray(self.rgb, dtype=np.float32)
            if self.rgb.shape != (n, 3):
                raise ValueError(f"rgb must be ({n}, 3), got {self.rgb.shape}")

    def __len__(self) -> int:
        return self.pos.shape[0]

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    def normals_or_zero(self) -> np.ndarray:
        if self.normal is None:
            return np.zeros_like(self.pos)
        return self.normal

    def rgb_or_invalid(self) -> np.ndarray:
        """Colors with the reference's 'no color' sentinel (-1,-1,-1)."""
        if self.rgb is None:
            return np.full_like(self.pos, -1.0)
        return self.rgb

    def has_color(self) -> np.ndarray:
        """Per-point color validity, mirroring Point3D::hasColor
        (ref:shared4pcs.h:92)."""
        rgb = self.rgb_or_invalid()
        return (rgb * rgb).sum(axis=1) > 0.001

    def take(self, idx: np.ndarray) -> "PointCloud":
        return PointCloud(
            pos=self.pos[idx],
            normal=None if self.normal is None else self.normal[idx],
            rgb=None if self.rgb is None else self.rgb[idx],
        )

    def transformed(self, mat: np.ndarray) -> "PointCloud":
        """Apply a homogeneous 4x4 transform to positions (normals are
        rotated, colors kept)."""
        mat = np.asarray(mat, dtype=np.float32)
        pos = self.pos @ mat[:3, :3].T + mat[:3, 3]
        normal = None
        if self.normal is not None:
            normal = self.normal @ mat[:3, :3].T
        return PointCloud(pos=pos, normal=normal, rgb=self.rgb)
