"""Measure the NEW combine-front variants on the v5e: FM discriminator
demod and CW spectral excision (both added late round 4).

Same protocol/geometry as exp_r4_combine_tpu.py (one 2^23-sample 32 MHz
block, K=3 carriers at 4 MHz bw, known-refresh fast scorer — the streaming
runtime's configuration; iterations chained through the carried EMA, one
small readback fences).  Questions:
  1. FM front cost vs AM (the discriminator replaces |z|: one atan2 pass
     over (K, M) instead of abs — both memory-bound elementwise).
  2. Excision cost (two cumsums + compares on the (K, M) band spectra
     before the ifft).
Results land in exp_r4_fm_tpu.log.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import tempest_tpu as tt
from tempest_tpu.ops.combine import combine_core
from tempest_tpu.ops.scan import _channel_geometry
from tempest_tpu.pipeline.offline import ReconstructionConfig, make_reconstruct_fn

FS = 32e6
BW = 4e6
N_C = 1 << 23
MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
CARRIERS3 = (-8e6, 2.5e6, 11e6)
ITERS = 24

N, M, FS_CHAN = _channel_geometry(N_C, FS, BW)
spf = FS_CHAN / MODE.refresh
n_frames = max(int((M - 2 - spf) / spf), 1)
cfg = ReconstructionConfig(
    sample_rate=FS_CHAN, mode=MODE, n_frames=n_frames, carry_phase=True,
    input_format="envelope", align_subpixel=True,
)
print(f"N={N} M={M} fs_chan={FS_CHAN/1e6} MHz n_frames={n_frames}",
      flush=True)

rng = np.random.default_rng(0)
words = jnp.asarray(rng.standard_normal(2 * N_C).astype(np.float32))
step = make_reconstruct_fn(cfg)
corr = min(0.1, 0.25 * M / FS_CHAN)


def build(demod="am", excise_db=None):
    @jax.jit
    def block(w, ema):
        env, wt, pol, mass, _ = combine_core(
            w, FS, CARRIERS3, BW, FS_CHAN, corr, 55.0, 65.0, "mrc",
            refresh_hz=60.0, demod=demod, excise_db=excise_db)
        ema2, _, _, _ = step(env[: cfg.block_samples], ema,
                             jnp.float32(0.3), jnp.float32(0.25))
        return ema2

    return block


def timed(fn, *args_first):
    ema = jnp.zeros(cfg.render_size, jnp.float32)
    ema = fn(*args_first, ema)
    np.asarray(ema[:1, :8])  # warm + fence
    t0 = time.perf_counter()
    for _ in range(ITERS):
        ema = fn(*args_first, ema)
    np.asarray(ema[:1, :8])
    return (time.perf_counter() - t0) / ITERS * 1e3


t_am = timed(build("am"), words)
print(f"K=3 AM front (baseline):        {t_am:.2f} ms/block", flush=True)
t_fm = timed(build("fm"), words)
print(f"K=3 FM discriminator front:     {t_fm:.2f} ms/block "
      f"(delta {t_fm - t_am:+.2f})", flush=True)
t_ax = timed(build("am", excise_db=0.0), words)
print(f"K=3 AM + excision:              {t_ax:.2f} ms/block "
      f"(delta {t_ax - t_am:+.2f})", flush=True)
t_fx = timed(build("fm", excise_db=0.0), words)
print(f"K=3 FM + excision:              {t_fx:.2f} ms/block "
      f"(delta {t_fx - t_am:+.2f})", flush=True)
for name, t in (("am", t_am), ("fm", t_fm), ("am+excise", t_ax)):
    print(f"realtime factor {name}: {1e3 * (N_C / FS) / t:.0f}x", flush=True)
print("done", flush=True)
