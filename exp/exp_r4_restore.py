"""Measure the PSNR gain of MTF restoration (ops.enhance.restore_image)
across operating points.  Fidelity is backend-independent; runs on CPU.

Result (2026-08-20, exp_r4_restore.log, shipped restore_image at nsr .002):
  judged 1080p60/20M a=.5   13.94 -> 14.39  (+0.45)
  judged 1080p60/20M a=.9   15.21 -> 16.34  (+1.13)
  640x480/4M deep a=.9      15.31 -> 16.56  (+1.25)
  640x480/32M cubic a=.9    22.78 -> 24.96  (+2.18)
  640x480/4M snr10 a=.5     11.35 -> 11.31  (-0.04, neutral)
Default nsr=0.002 chosen: within ~0.15 dB of each point's best while staying
neutral at 10 dB SNR (nsr .0005 adds ~+0.1-0.25 on deep/shallow clean points
but costs -0.25 at 10 dB).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import tempest_tpu as tt
from tempest_tpu.ops.enhance import restore_image
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.pipeline.offline import auto_reconstruct
from tempest_tpu.render.screen import aligned_psnr


def run(tag, mode_name, fs, seconds, snr, seed, alpha):
    mode = tt.ALL_VIDEO_MODES[mode_name]
    cap = tt.generate_iq(mode, fs, int(fs * seconds), snr_db=snr, seed=seed)
    timing, recon = auto_reconstruct(cap.iq, fs, alpha=alpha, restore=False)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    p0, _ = aligned_psnr(truth, recon.image)
    line = f"[{tag}] base {p0:.2f}"
    # Rebuild the config auto_reconstruct used (same auto interp rule).
    spf = fs / timing.mode.refresh
    taps = 4 if spf / timing.mode.pixels_per_frame >= 1.0 else 2
    from tempest_tpu.pipeline.offline import ReconstructionConfig
    cfg = ReconstructionConfig(sample_rate=fs, mode=timing.mode,
                               n_frames=recon.frames.shape[0],
                               align_subpixel=True, interp_taps=taps)
    for nsr in (0.01, 0.005, 0.002, 0.001, 0.0005):
        p, _ = aligned_psnr(truth, restore_image(recon.image, cfg, nsr=nsr))
        line += f"  nsr{nsr}: {p - p0:+.2f}"
    print(line, flush=True)


run("1080p60/20M a=.5 snr18", "1920x1080 @ 60Hz", 20e6, 0.25, 18.0, 33, 0.5)
run("1080p60/20M a=.9 snr18", "1920x1080 @ 60Hz", 20e6, 0.6, 18.0, 33, 0.9)
run("640x480/4M  a=.9 snr30", "640x480 @ 60Hz", 4e6, 0.8, 30.0, 3, 0.9)
run("640x480/32M a=.9 snr50", "640x480 @ 60Hz", 32e6, 0.3, 50.0, 3, 0.9)
run("640x480/4M  a=.5 snr10", "640x480 @ 60Hz", 4e6, 0.5, 10.0, 9, 0.5)
