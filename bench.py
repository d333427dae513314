"""Round benchmark: north-star-scale registration on the real TPU.

Headline metric (BASELINE.json north star, "200k-point scan pairs
>=10x faster than CPU Super4PCS at equal-or-better LCP"): time-to-
LCP>=0.7 on the fine-delta 100k-point pair (delta 0.01, n=8192,
noise sigma = 0.002).

vs_baseline is MEASURED (round 2): ``baselines/cpu_super4pcs.cc`` — an
algorithmically faithful serial C++ implementation of the reference
pipeline (the reference tree itself cannot compile here: empty vendored
Eigen, zero egress; single-threaded is fair because MatchSuper4PCS
forces 1 thread, ref:super4pcs.cc:70-73) — ran this exact config on
this machine's CPU: **3 trials in 560 s, best LCP 0.594, target 0.7 not
reached** (seed 5, g++ -O3 -march=native). 560 s is therefore a LOWER
bound on CPU time-to-target, and vs_baseline = 560 / measured_s is a
lower bound on the true speedup.

Context fields record the hippo quality-parity config (reference's own
demo: documented LCP 0.748792) and its measured CPU baseline. Honest
note, recorded in BASELINE.md: at hippo's toy scale (200 Q samples) the
serial CPU solves time-to-0.7 in 0.01-0.7 s — faster than any
accelerator can amortize dispatch; the TPU win is at scale, which is
what the north star asks for.

Prints exactly one JSON line.
"""

import json
import os
import sys

HIPPO1 = "/root/reference/assets/hippo1.obj"
HIPPO2 = "/root/reference/assets/hippo2.obj"
# measured lower bound, baselines/cpu_super4pcs.cc on this machine (r2)
CPU_BASELINE_FLOOR_S = 560.0
TARGET_LCP = 0.70


def fine_delta_pair():
    import numpy as np
    rng = np.random.default_rng(0)
    n = 100_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
            + 0.2 * np.sin(4 * v[:, 2]))
    pos = (v * bump[:, None]).astype(np.float32)
    th = 0.8
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    q = (pos @ rot.T + np.float32([0.1, -0.05, 0.2])).astype(np.float32)
    q += rng.normal(scale=0.002, size=q.shape).astype(np.float32)
    return pos, q


SEEDS = (1, 3, 5, 7, 11)


def main():
    import numpy as np
    from super4pcs_tpu import MatchSuper4PCS, Options, PointCloud
    from super4pcs_tpu.io import read_object

    # --- headline: north-star scale (100k points, fine delta) ---
    # Multi-seed median (VERDICT r2 #6): one seed on a tunneled
    # high-variance device is not a headline; the median over 5 seeds
    # is robust to both the RANSAC lottery and RPC stalls.
    pos, q = fine_delta_pair()
    per_seed = []
    for seed in SEEDS:
        opts = (Options(delta=0.01, sample_size=8192, max_time_seconds=120,
                        random_seed=seed)
                .configure_overlap(TARGET_LCP,
                                   terminate_threshold=TARGET_LCP))
        r = MatchSuper4PCS(opts).compute_transformation(
            PointCloud(pos=pos), PointCloud(pos=q))
        per_seed.append(
            (r.stats.get("search_seconds", float("nan")), r))
    per_seed.sort(key=lambda t: t[0])
    search_s, res = per_seed[len(per_seed) // 2]   # median run
    seed_times = [round(t, 3) for (t, _) in per_seed]
    seed_lcps = sorted(round(r.score, 4) for (_, r) in per_seed)

    # --- context: hippo quality parity (reference demo config) ---
    hippo = {}
    if os.path.exists(HIPPO1):
        set1, _ = read_object(HIPPO1)
        set2, _ = read_object(HIPPO2)
        hopts = (Options(delta=0.01, sample_size=200, max_time_seconds=1000)
                 .configure_overlap(TARGET_LCP,
                                    terminate_threshold=TARGET_LCP))
        hres = MatchSuper4PCS(hopts).compute_transformation(set1, set2)
        hippo = {
            "hippo_lcp": round(hres.score, 4),
            "hippo_reference_lcp": 0.748792,
            "hippo_search_s": round(
                hres.stats.get("search_seconds", float("nan")), 3),
            # measured serial-CPU hippo time-to-0.7 (5 seeds, r2):
            # 0.01-0.67 s — small configs don't amortize accelerator
            # dispatch; see BASELINE.md
            "hippo_cpu_baseline_s": "0.01-0.67 (CPU wins at toy scale)",
        }

    # --- secondary: 1M-point ultra scale (BASELINE.json config #5
    # upper end; VERDICT r2 #5). One seed — the metric is "the 1M
    # config registers on one chip and how fast", not a lottery study
    # (tools/ultra_scale.py is the standalone form).
    ultra = {}
    try:
        rng = np.random.default_rng(0)
        n = 1_000_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
                + 0.2 * np.sin(4 * v[:, 2]))
        upos = (v * bump[:, None]).astype(np.float32)
        th = 0.8
        rot = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]],
                       np.float32)
        uq = (upos @ rot.T
              + np.float32([0.1, -0.05, 0.2])).astype(np.float32)
        uq += rng.normal(scale=0.001, size=uq.shape).astype(np.float32)
        # budget PINNED at 120 s (VERDICT r4 #3: r4 quietly moved this
        # config to 300 s, changing the series definition mid-flight;
        # 120 s is the r3 level and the published 5-seed distribution's
        # operating point — BASELINE.md "Round 5: the 1M metric")
        uopts = (Options(delta=0.005, sample_size=16384,
                         max_time_seconds=120, random_seed=5)
                 .configure_overlap(TARGET_LCP,
                                    terminate_threshold=TARGET_LCP))
        ures = MatchSuper4PCS(uopts).compute_transformation(
            PointCloud(pos=upos), PointCloud(pos=uq))
        ultra = {
            "ultra1m_lcp": round(ures.score, 4),
            "ultra1m_search_s": round(
                ures.stats.get("search_seconds", float("nan")), 2),
            "ultra1m_trials": ures.n_trials,
            "ultra1m_nq": 16384,
        }
    except Exception as e:  # never let the secondary kill the headline
        ultra = {"ultra1m_error": f"{type(e).__name__}: {e}"[:200]}

    # --- secondary: multi-scan sequence regression (VERDICT r3 #8;
    # the matching.cc-analog protocol, driver-visible per round). The
    # 4-view synthetic sequence + the hippo-derived sequence both run
    # the merged-set GT protocol (sequence.register_sequence) and are
    # judged by the reference thresholds rot<=0.2 / tr<=0.1
    # (ref:tests/matching.cc:333-335). Real Stanford data is
    # unavailable (zero egress); BASELINE.md documents the gap.
    seq = {}
    try:
        from super4pcs_tpu.sequence import register_sequence

        def quat_rot(w, x, y, z):
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]])

        def aa_quat(axis, angle):
            axis = np.asarray(axis, np.float64)
            axis = axis / np.linalg.norm(axis)
            return (np.cos(angle / 2), *(axis * np.sin(angle / 2)))

        quats = [aa_quat([0, 0, 1], 0.0), aa_quat([0, 1, 0], 0.9),
                 aa_quat([1, 0, 1], -0.7), aa_quat([1, 1, 0], 1.3)]
        trs = [[0, 0, 0], [0.10, -0.05, 0.08], [-0.07, 0.12, 0.02],
               [0.04, 0.06, -0.11]]
        gts = []
        for (w, x, y, z), t in zip(quats, trs):
            m = np.eye(4)
            m[:3, :3] = quat_rot(w, x, y, z)
            m[:3, 3] = -m[:3, :3] @ np.asarray(t, np.float64)
            gts.append(m.astype(np.float32))

        def views(model, starts, width):
            x = model[:, 0]
            lo, hi = x.min(), x.max()
            out = []
            for s in starts:
                a = lo + s * (hi - lo)
                out.append(model[(x >= a) & (x <= a + width * (hi - lo))])
            return out

        def run_seq(model, delta, sample, scale):
            from super4pcs_tpu import PointCloud as PC
            scans = [PC(pos=(v @ m[:3, :3].T + m[:3, 3]).astype(
                np.float32)) for v, m in zip(
                    views(model, [0.0, 0.15, 0.3, 0.35], 0.65), gts)]
            sopts = Options(delta=delta, sample_size=sample,
                            max_time_seconds=90, bases_per_step=16,
                            max_quads=2048, max_candidates=4096,
                            p_sample_budget=scale, random_seed=5,
                            ).configure_overlap(0.5, 0.6)
            steps = register_sequence(scans, sopts, gt_transforms=gts)
            return {
                "max_rot_diff": round(max(s.rot_diff for s in steps), 4),
                "max_tr_diff": round(max(s.tr_diff for s in steps), 4),
                "pass": all(s.rot_diff <= 0.2 and s.tr_diff <= 0.1
                            for s in steps),
                "lcps": [round(s.result.score, 3) for s in steps],
            }

        rngs = np.random.default_rng(7)
        v = rngs.normal(size=(4000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        bump = (1 + 0.3 * np.sin(5 * v[:, 0]) * np.cos(3 * v[:, 1])
                + 0.2 * np.sin(4 * v[:, 2]))
        synth = run_seq((v * bump[:, None]).astype(np.float32),
                        0.03, 300, 1024)
        seq = {f"sequence_synth_{k}": val for k, val in synth.items()}
        if os.path.exists(HIPPO1):
            hmodel, _ = read_object(HIPPO1)
            hseq = run_seq(hmodel.pos.astype(np.float32), 0.01, 300, 4096)
            seq.update({f"sequence_hippo_{k}": val
                        for k, val in hseq.items()})
    except Exception as e:  # never let the secondary kill the headline
        seq = {"sequence_error": f"{type(e).__name__}: {e}"[:200]}

    out = {
        "metric": "fine100k_time_to_lcp0.7_s_median5seed",
        "value": round(float(search_s), 3),
        "unit": "s",
        # lower bound: the CPU baseline had not reached the target when
        # stopped at 560 s (LCP 0.594)
        "vs_baseline": round(CPU_BASELINE_FLOOR_S / max(search_s, 1e-9), 1),
        "lcp": round(res.score, 4),
        "trials": res.n_trials,
        "seeds": list(SEEDS),
        "seed_search_s": seed_times,      # sorted; value is the median
        "seed_lcps": seed_lcps,
        "compile_s": round(res.stats.get("compile_seconds", 0.0), 1),
        "baseline": "cpu_super4pcs_serial DNF@560s lcp=0.594 (measured)",
        **hippo,
        **ultra,
        **seq,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
