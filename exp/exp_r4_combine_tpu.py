"""Measure the live-combine front (channelise + MRC fusion) on the v5e.

Protocol (CLAUDE.md measurement discipline): iterations chained through the
carried EMA image, one small readback fences the loop; per-block cost =
(t_total / iters).  The chain-only loop runs the identical reconstruction
step on a precomputed envelope, so composite − chain isolates the front.

Geometry: one source block of 2^23 complex samples at 32 MHz (0.26 s),
K carriers at 4 MHz channel bandwidth → M = 2^20 channel samples at 4 MHz,
14 frames of 640x480@60 per block — the live-combine streaming shape.

Result (2026-08-20, v5e via tunnel, exp_r4_combine_tpu.log):
  chain-only (envelope -> exact cuts -> subpixel sync -> EMA, 14f): 1.9-2.2
  full scorer:  K=3 29.9 ms/block (front 28.0), K=1 24.7 (22.8);
                per-extra-carrier 2.59 ms -> 9x realtime at 32 MHz
  known-refresh fast scorer (comb mass read at the known frame lags — 15
  dots/channel instead of FFT autocorrelation + period search):
                K=3 23.3 ms/block (front 21.4), K=1 22.7 (20.8);
                per-extra-carrier 0.28 ms (9.2x cheaper) -> 11x realtime
  The remaining front cost is K-independent: the 2^23-point capture FFT +
  band slices/ifft/abs (~20.8 ms) — attacked separately by the per-carrier
  mixer+FIR probe (exp_r4_fir_front.py).
"""
import os
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
print(f"N={N} M={M} fs_chan={FS_CHAN/1e6} MHz n_frames={n_frames} "
      f"block_samples={cfg.block_samples}", flush=True)

rng = np.random.default_rng(0)
words = jnp.asarray(rng.standard_normal(2 * N_C).astype(np.float32))
step = make_reconstruct_fn(cfg)
corr = min(0.1, 0.25 * M / FS_CHAN)


def build(carriers, refresh_hz=None):
    @jax.jit
    def block(w, ema):
        env, wt, pol, mass, _ = combine_core(
            w, FS, carriers, BW, FS_CHAN, corr, 55.0, 65.0, "mrc",
            refresh_hz=refresh_hz)
        ema2, _, _, _ = step(env[: cfg.block_samples], ema,
                             jnp.float32(0.3), jnp.float32(0.25))
        return ema2

    return block


@jax.jit
def chain_only(env, ema):
    ema2, _, _, _ = step(env, ema, jnp.float32(0.3), jnp.float32(0.25))
    return ema2


def timed(fn, *args_first):
    ema = jnp.zeros(cfg.render_size, jnp.float32)
    ema = fn(*args_first, ema)
    np.asarray(ema[:1, :8])  # warm + fence
    t0 = time.perf_counter()
    for _ in range(ITERS):
        ema = fn(*args_first, ema)
    np.asarray(ema[:1, :8])
    return (time.perf_counter() - t0) / ITERS * 1e3


env_fixed = jnp.asarray(
    rng.standard_normal(cfg.block_samples).astype(np.float32) ** 2)
t_chain = timed(chain_only, env_fixed)
print(f"chain-only {n_frames}f: {t_chain:.2f} ms/block", flush=True)
t3 = timed(build(CARRIERS3), words)
print(f"composite K=3: {t3:.2f} ms/block (front {t3 - t_chain:.2f})",
      flush=True)
t1 = timed(build(CARRIERS3[:1]), words)
print(f"composite K=1: {t1:.2f} ms/block (front {t1 - t_chain:.2f}, "
      f"per-extra-carrier {(t3 - t1) / 2:.2f})", flush=True)
rt = 1e3 * (N_C / FS) / t3
print(f"live combine K=3 realtime factor: {rt:.0f}x", flush=True)

# Known-refresh fast scorer (the streaming runtime's front): comb mass read
# at the known frame lags (15 dots/channel) instead of FFT autocorrelation
# + period search per channel.
t3f = timed(build(CARRIERS3, refresh_hz=60.0), words)
print(f"composite K=3 known-refresh: {t3f:.2f} ms/block "
      f"(front {t3f - t_chain:.2f})", flush=True)
t1f = timed(build(CARRIERS3[:1], refresh_hz=60.0), words)
print(f"composite K=1 known-refresh: {t1f:.2f} ms/block "
      f"(front {t1f - t_chain:.2f}, per-extra-carrier "
      f"{(t3f - t1f) / 2:.2f})", flush=True)
print(f"live combine K=3 known-refresh realtime factor: "
      f"{1e3 * (N_C / FS) / t3f:.0f}x", flush=True)
print("done", flush=True)
