"""One fine-delta run with CLI-overridable TPU knobs.

Usage: python _sweep.py seed=5 pair_recall_target=0.85 pair_row_cap=96 \
                        bases_per_step=16 max_pairs=524288
Prints one JSON line.
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
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q))
extra = {}
if "escalated_to" in res.stats:
    extra = {"escalated_to": res.stats["escalated_to"],
             "esc_compile_s": round(
                 res.stats["escalation_compile_seconds"], 1)}
print(json.dumps({**{k: str(v) for k, v in over.items()}, "seed": seed,
                  "lcp": round(res.score, 4), "trials": res.n_trials,
                  "search_s": round(res.stats["search_seconds"], 2),
                  "pairs_ovf": int(res.stats["pairs_overflow"]),
                  "compile_s": round(res.stats["compile_seconds"], 1),
                  **extra}),
      flush=True)
