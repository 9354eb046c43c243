"""FM-harmonic combining: measurement log (CPU).

Findings (committed in exp_r4_fm_combine.log):
  1. Fusion gain: demod="fm" over three equal-strength FM carriers
     (1.2 MHz deviation, one inverted) beats the best single carrier by
     +0.21 dB at 10 dB SNR (chain ceiling compresses) and +0.98 dB at
     2 dB SNR.  Weights balance (~1/3 each) and the inverted-deviation
     carrier is flipped before summation.
  2. THE BUG THIS EXPOSED: the fused polarity was anchored to the
     strongest channel — with equal masses the anchor is an arbitrary
     draw, and a pass-2 anchor landing on the INVERTED carrier
     reconstructed at 6.0 dB vs 14.1 for the flip.  Fix: re-base the
     output polarity to the first gated carrier (combine_core), so the
     contract is "the fused envelope carries centers_hz[0]'s modulation
     sense" (the operator's invert knob handles the physically
     unknowable absolute sense).  Mirrored in the sharded kernel with
     two extra scalar collectives (pmin candidate index + one-hot psum
     of the sign).
  3. FM sweep (scan_band(demod="fm")) detects the emission with 15-22 dB
     prominence over a 6.8 dB measured discriminator-null floor — but a
     sharp-edged video at 1.2 MHz deviation spreads FM sidebands across
     the WHOLE band (Carson bw >> chan_bw): most channels comb, and
     mass-based localisation is genuinely ill-posed for this fixture
     (best channel lands 2 MHz off).  The honest FM workflow is
     detection via the sweep + fusion over LISTED carriers; the AM sweep
     is not asserted blind either (brick-wall channel edges convert FM
     sidebands to AM — measured 17-20 dB AM prominence on an FM-only
     capture).
"""
import os, sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import tempest_tpu as tt
from tempest_tpu.ops.combine import combine_harmonics
from tempest_tpu.ops.scan import scan_band, scan_centers
from tempest_tpu.pipeline.offline import (
    estimate_timing, ReconstructionConfig, reconstruct_frames)
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.render.screen import aligned_psnr

MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
FS = 32e6
CARRIERS = [-8e6, 2.5e6, 11e6]


def rec(env, fs_chan, tr, alpha=0.3):
    t = estimate_timing(env, fs_chan, 0.1, 50., 90., envelope=True)
    spf = fs_chan / t.mode.refresh
    nf = max(int((len(env) - 1) / spf), 1)
    cfg = ReconstructionConfig(sample_rate=fs_chan, mode=t.mode, n_frames=nf,
                               align_subpixel=True, input_format="envelope")
    return (aligned_psnr(tr, reconstruct_frames(env, cfg, alpha=alpha).image)[0],
            t.mode_name)


for snr in (10.0, 2.0):
    cap = tt.generate_iq_harmonics(
        MODE, FS, int(FS * 0.55), CARRIERS, snr_db=snr,
        amplitudes=[1., 1., 1.], depths=[0.8, 0.8, -0.8],
        modulation="fm", deviation_hz=1.2e6, seed=3)
    tr = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    c1 = combine_harmonics(cap.iq, FS, [CARRIERS[0]], demod="fm")
    c3 = combine_harmonics(cap.iq, FS, CARRIERS, demod="fm")
    p1, m1 = rec(c1.envelope, c1.fs_channel, tr)
    p3, m3 = rec(c3.envelope, c3.fs_channel, tr)
    print(f"snr={snr}: single={p1:.2f} ({m1})  fused={p3:.2f} ({m3}) "
          f"gain={p3 - p1:+.2f}")
    print("  weights", c3.weights.round(3), "pol", c3.polarity,
          "mass", c3.mass_db.round(1))

# Sweep statistics on the 10 dB capture: FM detects; AM sees edge-converted
# sidebands (NOT blind — don't claim it).
cap = tt.generate_iq_harmonics(
    MODE, FS, int(FS * 0.55), CARRIERS, snr_db=10.0,
    amplitudes=[1., 1., 1.], depths=[0.8, 0.8, -0.8],
    modulation="fm", deviation_hz=1.2e6, seed=3)
centers = scan_centers(FS, step_hz=2e6, guard_hz=2e6)
for d in ("am", "fm"):
    res = scan_band(cap.iq, FS, centers, corr_seconds=0.1, demod=d)
    ems = res.emissions()
    print(f"{d} sweep: floor {res.floor_db[0]:.1f} dB, "
          f"{len(ems)} emission group(s): "
          + ", ".join(f"{e['best_channel_hz']/1e6:+.1f}MHz "
                      f"prom {e['prominence_db']:.1f}" for e in ems))
