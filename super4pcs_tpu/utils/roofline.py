"""Per-phase roofline accounting (VERDICT r3 #2).

The reference's only efficiency instrument is a seconds table
(ref:src/super4pcs/algorithms/match4pcsBase.hpp:77-83). Matching-or-
beating it on a TPU needs the extra axis seconds cannot give: how far
each phase sits from the chip's compute and bandwidth ceilings, i.e.
whether more perf work on a phase can pay at all. The device step's
builder attaches a first-order analytic cost model (FLOPs + HBM bytes
per phase, derived from the same static capacities that size the
buffers — see matcher._build_try_base/_build_step), and
``attribute`` turns (cost, measured seconds) into achieved rates,
percent-of-peak, a bound classification, and the theoretical headroom.

The model is FIRST-ORDER by design: gather-heavy phases count each
logical byte once (no cache-line amplification), sorts use the bitonic
network pass count XLA:TPU actually generates, and elementwise FLOP
weights are rounded. That is accurate enough for its one job —
deciding whether a phase is compute-, memory-, or dispatch-bound and
bounding the speedup still on the table.
"""

from __future__ import annotations

# TPU v5e (v5 lite — the ambient bench chip) public peaks.
#   mxu_bf16: 197 TFLOP/s (394 TOPS int8 / 2)
#   mxu_f32:  ~= bf16 / 4 (f32 operands pass the MXU at quarter rate)
#   vpu_f32:  CALIBRATED (VERDICT r4 #6, tools/vpu_calibrate.py): the
#             Pallas LCP kernel — exactly 8 f32 VPU ops per
#             (candidate, q, p) triple, the same count the step cost
#             model uses — achieves 3.10 TFLOP/s on the bench chip at
#             its best shape (c=128, nq=1024, np=500k; 2.3-3.1 across
#             shapes), so the true peak is >= 3.1e12 and the 3.5e12
#             figure (~2048 lanes x ~1.7 GHz) overstates it by at most
#             ~13% if the kernel is at speed-of-light. Percent-of-peak
#             columns therefore carry a <= ~13% error bar, not an
#             order of magnitude.
#   hbm:      819 GB/s
TPU_V5E = dict(
    name="TPU v5e",
    mxu_bf16_flops=197.0e12,
    mxu_f32_flops=49.0e12,
    vpu_f32_flops=3.5e12,
    hbm_bytes_per_s=819.0e9,
)

#: below this wall-clock a phase is dominated by launch/fusion overhead
#: and neither ceiling is meaningful
DISPATCH_FLOOR_S = 1.5e-3
#: below this fraction of BOTH peaks the phase is overhead-bound even
#: if it takes visible time (e.g. serial dependency chains)
UTILIZATION_FLOOR = 0.02


def attribute(costs: dict, seconds: dict, peaks: dict = TPU_V5E) -> dict:
    """Join the analytic cost model with measured per-phase seconds.

    ``costs``: {phase: {"flops": F, "hbm_bytes": B, "unit": "vpu"|"mxu"}}
    (unit selects which compute ceiling the phase's FLOPs are judged
    against; default "vpu"). ``seconds``: {phase: measured_s}.

    Returns {phase: {"seconds", "gflops", "gbps", "compute_pct",
    "memory_pct", "bound", "headroom_x"}} where ``bound`` is
    "compute" / "memory" / "dispatch" and ``headroom_x`` is the factor
    left to the binding ceiling (inf-like cap 1e4 for dispatch-bound
    phases, where the fix is fewer/fused launches, not kernel work).
    """
    out = {}
    for phase, c in costs.items():
        t = seconds.get(phase)
        if t is None:
            continue
        t = max(float(t), 1e-9)
        fl = float(c.get("flops", 0.0))
        by = float(c.get("hbm_bytes", 0.0))
        if t < DISPATCH_FLOOR_S:
            # sub-floor phases are unmeasurable through the telescoped
            # probes (differences of RPC-jittered wall clocks): rates
            # would be noise — report only the classification
            fl = by = 0.0
        peak_f = (peaks["mxu_f32_flops"] if c.get("unit") == "mxu"
                  else peaks["vpu_f32_flops"])
        comp = fl / t / peak_f
        mem = by / t / peaks["hbm_bytes_per_s"]
        if t < DISPATCH_FLOOR_S or max(comp, mem) < UTILIZATION_FLOOR:
            bound = "dispatch"
            headroom = 1.0e4
        elif mem >= comp:
            bound = "memory"
            headroom = 1.0 / max(mem, 1e-12)
        else:
            bound = "compute"
            headroom = 1.0 / max(comp, 1e-12)
        out[phase] = dict(
            seconds=round(t, 6),
            gflops=round(fl / t / 1e9, 2),
            gbps=round(by / t / 1e9, 2),
            compute_pct=round(100.0 * comp, 2),
            memory_pct=round(100.0 * mem, 2),
            bound=bound,
            headroom_x=round(min(headroom, 1.0e4), 1),
        )
    return out


def table(roof: dict) -> str:
    """Human-readable roofline table (BASELINE.md / verbose log form)."""
    hdr = (f"{'phase':<16}{'s':>9}{'GFLOP/s':>10}{'GB/s':>9}"
           f"{'%comp':>8}{'%mem':>8}  bound (headroom)")
    lines = [hdr]
    for ph, r in roof.items():
        lines.append(
            f"{ph:<16}{r['seconds']:>9.4f}{r['gflops']:>10.1f}"
            f"{r['gbps']:>9.1f}{r['compute_pct']:>8.2f}"
            f"{r['memory_pct']:>8.2f}  {r['bound']}"
            f" ({r['headroom_x']:g}x)")
    return "\n".join(lines)
