"""Subprocess body of tests/test_distributed.py: one process of a
2-process ``jax.distributed`` CPU run of ``register_batch``.

Prints one JSON line with the per-pair scores so the parent can assert
that (a) both processes completed, (b) they agree bit-exactly on the
replicated results. An optional control file carries a wall-clock
budget override and a ``batch_state`` to resume from — the parent uses
it to simulate a host failure (kill the whole job early) followed by a
fresh job resuming from the replicated checkpoint.
"""

import json
import sys


def main():
    coordinator, nprocs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    control = {}
    if len(sys.argv) > 4 and sys.argv[4] != "-":
        with open(sys.argv[4]) as fh:
            control = json.load(fh)

    from super4pcs_tpu.parallel import distributed
    distributed.initialize(coordinator, nprocs, pid, local_cpu_devices=1)

    import numpy as np
    from super4pcs_tpu import Options, PointCloud
    from super4pcs_tpu.parallel import register_batch

    # deterministic tiny fixture (same on every process)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(80, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = 1.0 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
    pos = (v * bump[:, None]).astype(np.float32)
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1]], np.float32)
    q = (pos @ rot.T + np.float32([0.2, -0.1, 0.3])).astype(np.float32)

    pairs = [(PointCloud(pos=pos), PointCloud(pos=q))] * 2
    opts = Options(delta=0.05, sample_size=80,
                   max_time_seconds=control.get("max_time_seconds", 60),
                   bases_per_step=4, max_quads=256, max_candidates=256,
                   refine_iterations=0,
                   random_seed=3).configure_overlap(0.9)

    on_checkpoint = None
    die_after = control.get("die_after_steps")
    if die_after is not None:
        # preemption simulation: persist the replicated state every step
        # and hard-kill the process after N steps (every process dies at
        # the same deterministic point — as a revoked TPU slice would)
        import os
        steps = [0]

        def on_checkpoint(state):
            steps[0] += 1
            with open(control["state_path"] + f".{pid}", "w") as fh:
                json.dump(state, fh)
            if steps[0] >= die_after:
                os._exit(3)

    results = register_batch(pairs, opts,
                             mesh=distributed.global_mesh(),
                             resume_state=control.get("resume_state"),
                             on_checkpoint=on_checkpoint)
    out = {
        "pid": pid,
        "scores": [float(r.score) for r in results],
        "improved": [bool(r.improved) for r in results],
        "trials": results[0].n_trials,
    }
    if pid == 0:
        # replicated on every process; ship one copy to the parent
        out["batch_state"] = results[0].stats["batch_state"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
