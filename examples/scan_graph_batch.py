"""Batched scan-graph registration across all local devices.

Every (target, source) pair is registered in one SPMD program with the
pairs axis sharded over the mesh — the TPU form of multi-scan alignment
(BASELINE.md config 5).

Usage:
    python examples/scan_graph_batch.py scan0.ply scan1.ply scan2.ply ...
      (registers each consecutive pair)
"""

import sys

from super4pcs_tpu import Options
from super4pcs_tpu.io import read_object
from super4pcs_tpu.parallel import make_mesh, register_batch


def main():
    clouds = [read_object(p)[0] for p in sys.argv[1:]]
    pairs = [(clouds[i], clouds[i + 1]) for i in range(len(clouds) - 1)]
    opts = (Options(delta=0.01, sample_size=500, max_time_seconds=120)
            .configure_overlap(0.5))
    mesh = make_mesh(axis="pairs") if len(pairs) % max(
        1, len(make_mesh().devices.ravel())) == 0 else None
    results = register_batch(pairs, opts, mesh=mesh)
    for i, res in enumerate(results):
        print(f"pair {i}->{i+1}: LCP {res.score:.4f}")
        print(res.transform)


if __name__ == "__main__":
    main()
