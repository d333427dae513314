"""super4pcs_tpu — TPU-native global point-cloud registration.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Super4PCS reference library (4PCS + Super4PCS global registration):

- batched, vmapped RANSAC over planar 4-point bases (the reference's
  branchy one-base-per-trial loop becomes score-everything + argmax),
- tiled MXU distance kernels replacing kd-tree walks and sphere
  rasterization grids,
- sort/mask based congruent-set joins replacing pointer grids,
- sharding of the candidate axis over a `jax.sharding.Mesh` for
  multi-chip scaling.

Behavioral contract mirrors the reference public surface
(`Match4PCSOptions`, `ComputeTransformation`, visitor stream, CLI flags,
IO formats); see docstring citations of the form ``ref:file:line`` which
point into the reference tree for parity checking.
"""

from .options import Options
from .cloud import PointCloud
from .matcher import Match4PCS, MatchSuper4PCS, RegistrationResult
from .api import register
from .sequence import (SequenceStepResult, parse_stanford_conf,
                       reference_pose_diff, register_sequence)

__version__ = "0.2.0"

__all__ = [
    "Options",
    "PointCloud",
    "Match4PCS",
    "MatchSuper4PCS",
    "RegistrationResult",
    "register",
    "register_sequence",
    "parse_stanford_conf",
    "reference_pose_diff",
    "SequenceStepResult",
    "__version__",
]
