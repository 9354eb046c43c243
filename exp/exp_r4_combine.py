"""Measure multi-harmonic combining (ops.combine) against the best single
carrier across SNRs.  Fidelity is backend-independent; runs on CPU.

Result (2026-08-20, exp_r4_combine.log; 640x480@60 from a 32 MHz wideband
capture, carriers at -8/+2.5/+11 MHz, alpha .7, aligned PSNR dB):

  amplitudes [1,.7,.5] snr  6: single 12.99  combined 13.64 (+0.65)
                               auto-discovered 13.91 (+0.92)
                               inverted-middle-harmonic 13.65 (polarity [-])
                               equal weighting 13.63 (MRC >= equal)
  amplitudes [1,1,1]  snr  0: single 11.62  combined 12.89 (+1.27)
  amplitudes [1,1,1]  snr -4: single 10.28  combined 11.71 (+1.43)
  noise-only 4th carrier: weight exactly 0 (comb gate), PSNR unchanged.

MRC weights track channel strength ([0.39, 0.34, 0.27] for [1,.7,.5]);
the lag-1 decorrelation split (signal = c1, noise = c0-c1) replaced an
anchor-calibrated comb-mass estimate whose a^4 scaling (linear autocorr is
|corr|^2) inverted the ordering — kept here as the negative result.
LATER SUPERSEDED (same round): the lag-1 split mis-reads coherent
in-channel interference as signal; the shipped default is the
frame-periodic split (on-comb minus off-comb dots at the detected refresh,
raw a^2 scale so the ordering is right) — see ops/combine.py and
tests/test_combine.py::test_interferer_hit_channel_downweighted.
"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import tempest_tpu as tt
from tempest_tpu.pipeline.offline import combined_reconstruct
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.render.screen import aligned_psnr

MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
FS = 32e6
CARRIERS = [-8e6, 2.5e6, 11e6]


def psnr_of(cap, centers, **kw):
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    t, r, c = combined_reconstruct(cap.iq, FS, centers, alpha=0.7, **kw)
    return aligned_psnr(truth, r.image)[0], c


cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                               amplitudes=[1.0, 0.7, 0.5], snr_db=6.0, seed=5)
p1, _ = psnr_of(cap, [CARRIERS[0]])
p3, c3 = psnr_of(cap, CARRIERS)
pa, ca = psnr_of(cap, None)
pe, _ = psnr_of(cap, CARRIERS, weighting="equal")
print(f"[1,.7,.5] snr6: single {p1:.2f} combined {p3:.2f} auto {pa:.2f} "
      f"equal {pe:.2f} w={np.round(c3.weights, 3)} "
      f"auto_centers={ca.centers_hz}", flush=True)

capi = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                amplitudes=[1.0, 0.7, 0.5],
                                depths=[0.8, -0.8, 0.8], snr_db=6.0, seed=5)
pi_, ci = psnr_of(capi, CARRIERS)
print(f"inverted middle: combined {pi_:.2f} pol={ci.polarity}", flush=True)

for snr in (0.0, -4.0):
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   snr_db=snr, seed=5)
    p1, _ = psnr_of(cap, [CARRIERS[0]])
    p3, _ = psnr_of(cap, CARRIERS)
    print(f"[1,1,1] snr{snr:+.0f}: single {p1:.2f} combined {p3:.2f}",
          flush=True)

cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                               amplitudes=[1.0, 0.7, 0.5], snr_db=6.0, seed=5)
p4, c4 = psnr_of(cap, CARRIERS + [-13e6])
print(f"noise 4th carrier: combined {p4:.2f} w={np.round(c4.weights, 4)}",
      flush=True)
