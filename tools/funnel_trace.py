"""Improvement trace of one fine-delta run: prints (trial, best LCP)
at every visitor improvement, plus final overflow telemetry. Shows
where trials-to-solution goes — close misses (best creeps up) vs dead
steps (best flat until one jump).

Usage: python tools/funnel_trace.py seed=5 [knob=v ...]
"""
import _path  # noqa: F401  (repo root on sys.path)
import json
import sys

from bench import fine_delta_pair
from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.cli import parse_tpu_opts

kv = dict(item.split("=", 1) for item in sys.argv[1:])
seed = int(kv.pop("seed", 5))
over = parse_tpu_opts(",".join(f"{k}={v}" for k, v in kv.items())) if kv else {}

pos, q = fine_delta_pair()
opts = (Options(delta=0.01, sample_size=8192, max_time_seconds=120,
                random_seed=seed, **over)
        .configure_overlap(0.70, terminate_threshold=0.70))

trace = []


def visitor(fraction, lcp, transform):
    trace.append((fraction, float(lcp)))
    print(f"  frac={fraction:+.3f} best={lcp:.4f}", flush=True)


res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q), visitor=visitor)
stats = {k: (round(v, 3) if isinstance(v, float) else int(v))
         for k, v in res.stats.items() if not isinstance(v, dict)}
print(json.dumps({"seed": seed, "lcp": round(res.score, 4),
                  "trials": res.n_trials, "stats": stats}))
