"""Multi-chip scaling via jax.sharding (SPMD over a device mesh).

The reference has no distributed layer — its only parallelism is one
OpenMP parallel-for over congruent quads with a critical-section best
tracker (ref:src/super4pcs/algorithms/match4pcsBase.hpp:390-393,
467-484; SURVEY.md §2 checklist). The TPU-native equivalent:

- **bases axis** (this module): RANSAC trials are embarrassingly
  parallel, so a device step's bases shard across a 1-D mesh; each chip
  runs base selection -> pair extraction -> congruent join -> rigid fit
  -> LCP on its shard, and one tiny ``all_gather`` + argmax over ICI
  picks the global best — the distributed form of the reference's
  ``#pragma omp critical`` best update, with no shared mutable state.
- **pairs axis** (`batch`): independent scan pairs of a scan graph
  shard across chips/hosts with per-pair result gathers only
  (BASELINE.json config #5).
- **multi-host** (`distributed`): ``jax.distributed`` initialization +
  a global mesh over every process's devices, so the pairs axis scales
  across hosts over DCN.
"""

from . import distributed
from .sharded import make_mesh, sharded_step
from .batch import register_batch

__all__ = ["make_mesh", "sharded_step", "register_batch", "distributed"]
