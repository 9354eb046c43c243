"""Probe: replace the live-combine front's big-FFT channeliser with a
time-domain mixer + decimating FIR, per carrier.

Motivation (exp_r4_combine_tpu.log): the front's cost is K-independent-
dominated (~20 ms/block at N=2^23) — the capture FFT.  A per-carrier
mix (complex exponential) + lowpass decimate-by-D touches the 67 MB input
K times but does trivial compute; if XLA lowers the strided conv well this
should beat the FFT for small K.

Two formulations, same filter (Kaiser windowed-sinc, taps=8·D, cutoff at
the decimated Nyquist):
  conv:   lax.conv_general_dilated, stride D, real/imag as batch of 2
  stack:  polyphase slice-stack — reshape mixed signal to (M', D), stack P
          shifted copies, contract with the (P, D) polyphase filter bank
          (the repo's gather-free idiom)

Correctness vs the FFT channel: different filters (brick wall vs FIR), so
compare demodulated ENVELOPES (correlation) and MRC weights, not bits.

RESULT (2026-08-20, NEGATIVE — keep the FFT channeliser):
  CPU: both formulations correct (envelope corr 0.97-0.99 vs the FFT
  channel; band-edge carrier lowest — filter rolloff, expected).
  v5e (exp_r4_fir_front.log, N=2^23, K=3, chained):
    fft front    23.3 ms
    conv front   46.3 ms   (stride-8 conv_general_dilated, 2K batch)
    stack front  68.4 ms   (polyphase slice-stack matvecs)
  The mixer alone costs K passes of sin/cos + cmul over the 67 MB input —
  already ~K x the FFT's whole budget; TPU 1-D convs with 1 feature add
  more.  The big-FFT channeliser amortises ALL carriers into one pass and
  stays; the live-combine front's ~21 ms is declared its floor at this
  block size.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import tempest_tpu as tt
from tempest_tpu.ops.scan import _channel_geometry, _channelize_complex

FS = 32e6
BW = 4e6
MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
CARRIERS = (-8e6, 2.5e6, 11e6)


def kaiser_sinc(d, taps_per_phase=8, beta=8.0):
    taps = taps_per_phase * d
    n = np.arange(taps) - (taps - 1) / 2.0
    h = np.sinc(n / d) / d * np.kaiser(taps, beta)
    return (h / h.sum()).astype(np.float32)


def fir_front_conv(words, fs, centers, D, h):
    """Mix + strided conv per carrier; returns (K, M') amplitude envelopes."""
    n_c = words.shape[0] // 2
    ri = words[: 2 * (n_c // D) * D].reshape(-1, 2)
    n_c = ri.shape[0]
    t = jnp.arange(n_c, dtype=jnp.float32)
    outs = []
    for fc in centers:
        ph = (-2.0 * np.pi * fc / fs) * t
        c, s = jnp.cos(ph), jnp.sin(ph)
        # (x_re + j x_im)(c + j s): stack re/im as conv batch of 2.
        xr = ri[:, 0] * c - ri[:, 1] * s
        xi = ri[:, 0] * s + ri[:, 1] * c
        x = jnp.stack([xr, xi])[:, None, :]            # (2, 1, n)
        k = jnp.asarray(h)[None, None, :]              # (1, 1, taps)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(D,), padding=((len(h) - 1, 0),))
        outs.append(jnp.sqrt(y[0, 0] ** 2 + y[1, 0] ** 2))
    return jnp.stack(outs)


def fir_front_stack(words, fs, centers, D, h):
    """Mix + polyphase slice-stack decimator (gather-free idiom)."""
    n_c = words.shape[0] // 2
    keep = (n_c // D) * D
    ri = words[: 2 * keep].reshape(-1, 2)
    m_out = keep // D
    P = len(h) // D
    # Polyphase bank: y[m] = sum_{p,r} h2[p,r] * x[(m-p)*D + (D-1-r)]
    # with x blocked as (m', D): term (p, r) is a shifted row-slice.
    h2 = np.asarray(h, np.float32).reshape(P, D)[:, ::-1].copy()
    t = jnp.arange(keep, dtype=jnp.float32)
    outs = []
    for fc in centers:
        ph = (-2.0 * np.pi * fc / fs) * t
        c, s = jnp.cos(ph), jnp.sin(ph)
        xr = (ri[:, 0] * c - ri[:, 1] * s).reshape(m_out, D)
        xi = (ri[:, 0] * s + ri[:, 1] * c).reshape(m_out, D)

        def deci(xb):
            acc = jnp.zeros((m_out,), jnp.float32)
            for p in range(P):
                rows = jnp.pad(xb, ((p, 0), (0, 0)))[:m_out]
                acc = acc + rows @ jnp.asarray(h2[p])
            return acc

        outs.append(jnp.sqrt(deci(xr) ** 2 + deci(xi) ** 2))
    return jnp.stack(outs)


def main():
    on_tpu = "tpu" in sys.argv
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    n_c = 1 << 23 if on_tpu else 1 << 21
    N, M, fs_chan = _channel_geometry(n_c, FS, BW)
    D = N // M
    h = kaiser_sinc(D)
    print(f"n_c={n_c} N={N} M={M} D={D} fs_chan={fs_chan/1e6} MHz "
          f"taps={len(h)}", flush=True)

    cap = tt.generate_iq_harmonics(MODE, FS, n_c, CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   snr_db=10.0, seed=5)
    words = jnp.asarray(cap.iq.view(np.float32))

    # Correctness: envelope correlation vs the FFT channel (trim edges and
    # the FIR group delay; grids coincide since fs_chan matches).  CPU only:
    # this backend cannot transfer complex arrays to the host.
    checks = [] if on_tpu else [("conv", fir_front_conv),
                                ("stack", fir_front_stack)]
    if checks:
        chans_fft, _ = jax.jit(
            lambda w: _channelize_complex(w, FS, np.asarray(CARRIERS), BW)
        )(words)
        env_fft = np.abs(np.asarray(chans_fft))
    for name, fn in checks:
        env = np.asarray(jax.jit(
            lambda w: fn(w, FS, CARRIERS, D, h))(words))
        gd = max((len(h) - 1) // (2 * D), 1)  # group delay, output samples
        for k in range(len(CARRIERS)):
            a = env_fft[k][4 * gd : M - 4 * gd]
            aa = a - a.mean()
            best = -1.0
            for lag in range(0, 8 * gd + 1):  # scan the alignment
                b = env[k][lag : lag + len(a)]
                bb = b - b.mean()
                c = float((aa * bb).sum()
                          / np.sqrt((aa * aa).sum() * (bb * bb).sum()))
                best = max(best, c)
            print(f"{name} ch{k}: envelope corr {best:.5f}", flush=True)

    # Timing (chained accumulator, one fence).
    def timed(fn, iters=12):
        @jax.jit
        def step(w, acc):
            return 0.5 * acc + jnp.sum(fn(w, FS, CARRIERS, D, h), axis=0)

        acc = jnp.zeros(M if fn is not fir_front_conv else n_c // D,
                        jnp.float32)
        acc = step(words, acc)
        np.asarray(acc[:8])
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(words, acc)
        np.asarray(acc[:8])
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def fft_front(w):
        ch, _ = _channelize_complex(w, FS, np.asarray(CARRIERS), BW)
        return jnp.abs(ch).astype(jnp.float32)

    def timed_fft(iters=12):
        @jax.jit
        def step(w, acc):
            return 0.5 * acc + jnp.sum(fft_front(w), axis=0)

        acc = jnp.zeros(M, jnp.float32)
        acc = step(words, acc)
        np.asarray(acc[:8])
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(words, acc)
        np.asarray(acc[:8])
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"fft front K=3:   {timed_fft():.2f} ms", flush=True)
    print(f"conv front K=3:  {timed(fir_front_conv):.2f} ms", flush=True)
    print(f"stack front K=3: {timed(fir_front_stack):.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
