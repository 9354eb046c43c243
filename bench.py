"""End-to-end benchmark: IQ Msamples/s per chip through the full TEMPEST
reconstruction chain at 1920x1080@60 (the BASELINE.md primary config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is the real-time factor against the reference's recommended
20 Msps live bandwidth (docs/src/install.md:24) — 1.0 means the chain keeps up
with a 20 MHz SDR in real time, the reference's own operating point.
``ms_per_block``/``iters``/``n_frames``/``block_samples`` disambiguate the
loop-amortised headline (the per-block number is the honest dispatch cost).

The measured program is the round-4 streaming chain: carry-phase
sub-sample-exact frame cuts through the phase-quantised mxu3 tables
(ops.resample.StreamingExactPlan — one compiled executable, per-bin int32
tables as inputs) WITH the per-frame SUB-PIXEL sync stage on — since round
4 the PSNR-leading chain (sub-pixel registration, +0.4-0.5 dB) is ALSO the
fastest: the fractional registration runs as MXU shift-operator matmuls
(ops.framesync.shift_matrix) instead of dynamic rolls, measured
same-session 8.90 ms/36f vs 9.68 for the integer-sync round-3 judged
config (exp/exp_r4_subpixel.py).  This is exactly what ``StreamingRuntime``
runs block after block, phases cycling as a real stream's would.

Measurement notes:
* Input is raw interleaved int16 I/Q (the SDR wire format) — the production
  ingest path; demod happens on device.
* The EMA image threads through every iteration, so reading back the final
  EMA forces the whole chain to have executed; ``block_until_ready`` alone is
  not a reliable fence on the tunnelled TPU backend used in this environment.
* Phases vary per iteration exactly as a real block stream's would
  ((-i*block) % spf), so host bin selection and (after the warm pass) the
  cached per-bin device tables are included.
"""

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax

    # Persist compiled executables next to the repo: remote TPU compiles here
    # take minutes, and the benchmark program is identical across runs.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation, never a requirement

    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import ReconstructionConfig, make_reconstruct_fn
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    n_frames = 36  # 0.6 s of signal per dispatch; amortises per-block cost
    config = ReconstructionConfig(
        sample_rate=fs,
        mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
        n_frames=n_frames,
        input_format="iq_interleaved",
        carry_phase=True,
        subsample_align=True,
        do_align=True,
        # Sub-pixel registration via MXU shift operators (align_impl
        # defaults to "matmul"): +0.4-0.5 dB over integer sync AND faster
        # (8.90 vs 9.68 ms/36f same-session, exp/exp_r4_subpixel.py).
        align_subpixel=True,
        resampler="mxu3",
        phase_bins=64,
        # Weights einsum in bf16: BIT-EXACT on TPU (DEFAULT-precision f32
        # matmuls run bf16 MXU passes anyway — the cast only removes
        # materialised f32 intermediate bytes; measured 6.45 -> 6.31 ms on
        # the 36f fidelity block, exp/exp_r3_regroup_bf16.py).
        einsum_bf16=True,
    )
    step = make_reconstruct_fn(config)

    rng = np.random.default_rng(0)
    n = config.block_samples
    spf = config.samples_per_frame
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    ema = jnp.zeros(config.render_size, jnp.float32)
    alpha = jnp.float32(0.1)
    iters = 24  # amortises the tunnel's ~24 ms per-sync round trip
    phases = [(-i * n) % spf for i in range(iters)]

    # Warm-up / compile, with a readback fence.
    ema1, *_ = step(iq, ema, alpha, phases[0])
    _ = np.asarray(ema1[:1, :8])

    def timed() -> float:
        e = ema
        t0 = time.perf_counter()
        for p in phases:
            e, frames, sync, score = step(iq, e, alpha, p)
        # The EMA dependency chain serialises all iterations; materialising a
        # slice of the final image is therefore a full fence.
        _ = np.asarray(e[:1, :8])
        return time.perf_counter() - t0

    timed()  # settle + upload the per-bin tables once
    dt = min(timed(), timed())

    msps = n * iters / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "full-chain IQ throughput at 1080p60 (int16 ingest + demod + exact-cut resample + sub-pixel sync + EMA, carry-phase streaming)",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 20.0, 2),
                "ms_per_block": round(dt / iters * 1e3, 3),
                "iters": iters,
                "n_frames": n_frames,
                "block_samples": n,
            }
        )
    )


if __name__ == "__main__":
    main()
