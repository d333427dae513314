"""Fine-delta phase breakdown on TPU (perf baseline for ROADMAP #1)."""
import _path  # noqa: F401  (repo root on sys.path)
import json
from bench import fine_delta_pair
from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud

pos, q = fine_delta_pair()
opts = (Options(delta=0.01, sample_size=8192, max_time_seconds=30,
                random_seed=5, phase_timing=True)
        .configure_overlap(0.70, terminate_threshold=0.70))
res = MatchSuper4PCS(opts).compute_transformation(
    PointCloud(pos=pos), PointCloud(pos=q))
print(json.dumps({"lcp": round(res.score, 4),
                  "search_s": round(res.stats["search_seconds"], 2),
                  "phases": {k: round(v, 3) for k, v in
                             res.stats["phase_seconds"].items()}}))
