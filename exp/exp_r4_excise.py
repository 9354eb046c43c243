"""Spectral excision of in-channel CW interference (CPU measurement).

The one-channel-hit case was previously handled by WEIGHTING (the
frame-periodic robust MRC refuses the channel; fused 13.19 vs clean
13.47).  Excision RECOVERS it: null channel-spectrum bins louder than the
channel's own carrier peak (the emission's comb lines are all below the
carrier line — unit DC vs depth*env spread over many lines — so the comb
grid is protected by construction; a naive spike notch would delete the
signal, CLAUDE.md round-4 note), dilated to swallow the interferer's sinc
leakage skirt.

Measured (this log):
  clean      w [0.441 0.280 0.279] psnr 13.47
  dirty      w [0.600 0.382 0.018] psnr 13.19   (robust MRC only)
  dirty+exc  w [0.454 0.289 0.258] psnr 13.48   (full recovery)
  clean+exc  w identical to clean  psnr 13.47   (no false nulls)
Dilation matters: +-8 bins left the CW residual at -6 dB vs the carrier
(beat ~37% of envelope DC, weight stalled at 0.084); +-256 bins (cumsum
box dilation, O(M)) recovers fully.  512 of 2M bins nulled costs the
emission nothing measurable.
"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8")
import jax; jax.config.update("jax_platforms","cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
import tempest_tpu as tt
from tempest_tpu.pipeline.offline import estimate_timing, ReconstructionConfig, reconstruct_frames
from tempest_tpu.ops.combine import combine_harmonics
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.render.screen import aligned_psnr
MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]; FS=32e6; CARRIERS=[-8e6,2.5e6,11e6]
cap = tt.generate_iq_harmonics(MODE, FS, int(FS*0.55), CARRIERS,
    amplitudes=[1.0,0.7,0.7], snr_db=6.0, seed=5)
tr = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
n = len(cap.iq)
cw = (3.0*np.exp(2j*np.pi*11.3e6/FS*np.arange(n))).astype(np.complex64)
dirty = (cap.iq + cw).astype(np.complex64)
def rec(comb):
    t = estimate_timing(comb.envelope, comb.fs_channel, 0.1, 50., 90., envelope=True)
    spf = comb.fs_channel/t.mode.refresh
    nf = max(int((len(comb.envelope)-1)/spf),1)
    cfg = ReconstructionConfig(sample_rate=comb.fs_channel, mode=t.mode, n_frames=nf,
                               align_subpixel=True, input_format="envelope")
    return aligned_psnr(tr, reconstruct_frames(comb.envelope, cfg, alpha=0.7).image)[0]
c_clean = combine_harmonics(cap.iq, FS, CARRIERS)
c_dirty = combine_harmonics(dirty, FS, CARRIERS)
c_exc   = combine_harmonics(dirty, FS, CARRIERS, excise_db=0.0)
c_cl_ex = combine_harmonics(cap.iq, FS, CARRIERS, excise_db=0.0)
print("clean      w", c_clean.weights.round(3), "psnr", round(rec(c_clean),2))
print("dirty      w", c_dirty.weights.round(3), "psnr", round(rec(c_dirty),2))
print("dirty+exc  w", c_exc.weights.round(3),   "psnr", round(rec(c_exc),2))
print("clean+exc  w", c_cl_ex.weights.round(3), "psnr", round(rec(c_cl_ex),2))
