"""Hippo config with TPU knob overrides (dispatch amortization test).

Usage: python _hippo_sweep.py seed=0 bases_per_step=64
"""
import _path  # noqa: F401  (repo root on sys.path)
import json
import sys
from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
from super4pcs_tpu.io import read_object
from super4pcs_tpu.cli import parse_tpu_opts

kv = dict(item.split("=", 1) for item in sys.argv[1:])
seed = int(kv.pop("seed", 0))
over = parse_tpu_opts(",".join(f"{k}={v}" for k, v in kv.items())) if kv else {}

set1, _ = read_object("/root/reference/assets/hippo1.obj")
set2, _ = read_object("/root/reference/assets/hippo2.obj")
opts = (Options(delta=0.01, sample_size=200, max_time_seconds=1000,
                random_seed=seed, **over)
        .configure_overlap(0.70, terminate_threshold=0.70))
res = MatchSuper4PCS(opts).compute_transformation(set1, set2)
extra = {}
if "phase_seconds" in res.stats:
    extra["phases"] = {k: round(v, 4)
                       for k, v in res.stats["phase_seconds"].items()}
    extra["initial_verify_s"] = round(
        res.stats.get("initial_verify_seconds", 0.0), 4)
    extra["fused_dispatches"] = res.stats.get("fused_dispatches")
print(json.dumps({**{k: str(v) for k, v in over.items()}, **extra,
                  "seed": seed,
                  "lcp": round(res.score, 4), "trials": res.n_trials,
                  "search_s": round(res.stats["search_seconds"], 3),
                  "compile_s": round(res.stats["compile_seconds"], 1),
                  "esc": res.stats.get("escalated_to"),
                  "esc_compile_s": round(res.stats.get("escalation_compile_seconds", 0.0), 1)}),
      flush=True)
