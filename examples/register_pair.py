"""Register two point-cloud files and stream live progress.

The streaming-visitor pattern is the analog of the reference's Meshlab
plugin (ref:demos/MeshlabPlugin/.../globalregistration.cpp:107-133): the
callback receives every improved pose as it is found, in the original
(uncentered) coordinate frame.

Usage:
    python examples/register_pair.py target.ply source.ply [delta]
"""

import sys

import numpy as np

from super4pcs_tpu import MatchSuper4PCS, Options
from super4pcs_tpu.io import read_object, write_object


class StreamingVisitor:
    """Receives (fraction, best_lcp, global_transform) live."""

    def __init__(self):
        self.poses = []

    def __call__(self, fraction, best_lcp, transform):
        if fraction < 0:            # improvement event
            self.poses.append(np.array(transform))
            print(f"  improved: LCP={best_lcp:.4f}")
        else:
            print(f"  progress {fraction * 100:5.1f}%  "
                  f"best LCP {best_lcp:.4f}", end="\r")

    def needs_global_transformation(self):
        return True                 # poses in original coordinates


def main():
    target_path, source_path = sys.argv[1], sys.argv[2]
    delta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

    target, _ = read_object(target_path)
    source, _ = read_object(source_path)
    print(f"target: {len(target)} pts, source: {len(source)} pts")

    opts = (Options(delta=delta, sample_size=200, max_time_seconds=60)
            .configure_overlap(0.7))
    visitor = StreamingVisitor()
    result = MatchSuper4PCS(opts).compute_transformation(
        target, source, visitor=visitor)

    print(f"\nfinal LCP: {result.score:.4f} "
          f"after {result.n_trials} trials "
          f"({result.stats.get('search_seconds', 0.0):.2f}s search)")
    print(result.transform)
    out = write_object("registered.ply", result.transformed_q or source)
    print(f"wrote {out}; {len(visitor.poses)} intermediate poses streamed")


if __name__ == "__main__":
    main()
