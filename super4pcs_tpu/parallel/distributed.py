"""Multi-host (multi-process) execution scaffold.

The reference is strictly single-process (SURVEY.md §2 parallelism
checklist); the TPU-native scale-out plan (SURVEY.md §5, BASELINE.json
config #5) shards *independent registration pairs* across hosts over
DCN: each process contributes its local devices to one global
``jax.sharding.Mesh`` whose 'pairs' axis carries the scan-graph batch —
embarrassingly parallel, the only cross-host traffic is the per-step
gather of tiny per-pair results inside ``register_batch``'s SPMD
program.

Run recipe (one process per host; same inputs on every host):

    # host 0 (coordinator)
    python my_job.py --coordinator=host0:8476 --nprocs=2 --pid=0
    # host 1
    python my_job.py --coordinator=host0:8476 --nprocs=2 --pid=1

    # my_job.py
    from super4pcs_tpu.parallel import distributed, register_batch
    distributed.initialize(coordinator, nprocs, pid)
    results = register_batch(pairs, opts, mesh=distributed.global_mesh())

Every process receives the full result list (outputs are replicated by
an in-program all_gather). Tested by a 2-process CPU smoke run
(tests/test_distributed.py) — the same pattern the single-host suite
uses to stand in for real chips (SURVEY.md §4 multi-node testing note).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_cpu_devices: Optional[int] = None) -> None:
    """Join the ``jax.distributed`` coordination service.

    Must run before any JAX device use. ``local_cpu_devices`` forces
    that many virtual CPU devices on this process (test/smoke runs on
    machines without multiple accelerators); production TPU processes
    leave it ``None`` and contribute their real local chips.
    """
    if local_cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{local_cpu_devices}").strip()
    import jax
    if local_cpu_devices:
        # the env-var route alone is too late when a sitecustomize has
        # already imported jax (see tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_mesh(axis: str = "pairs"):
    """1-D mesh over every device of every process (call after
    :func:`initialize`)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis,))
