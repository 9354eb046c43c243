"""End-to-end benchmark: IQ Msamples/s per chip through the full TEMPEST
reconstruction chain at 1920x1080@60 (the BASELINE.md primary config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the real-time factor against the reference's recommended
20 Msps live bandwidth (docs/src/install.md:24) — 1.0 means the chain keeps up
with a 20 MHz SDR in real time, the reference's own operating point.

Measurement notes:
* Input is raw interleaved int16 I/Q (the SDR wire format) — the production
  ingest path; demod happens on device.
* The EMA image threads through every iteration, so reading back the final
  EMA forces the whole chain to have executed; ``block_until_ready`` alone is
  not a reliable fence on the tunnelled TPU backend used in this environment.
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
    # 36-frame blocks (0.6 s of signal).  After the ingest rewire (int16
    # de-interleave as one-hot lane matmuls), the slice-stack sync scores,
    # and static frame cuts: 36f measured 9.16 ms = 1310 Msps (65x real
    # time), remote compile 27 s.  The default resampler is the zero-gather
    # mxu3 chain.
    config = ReconstructionConfig(
        sample_rate=fs,
        mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
        n_frames=36,
        input_format="iq_interleaved",
    )
    step = make_reconstruct_fn(config)

    rng = np.random.default_rng(0)
    n = config.block_samples
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    ema = jnp.zeros(config.render_size, jnp.float32)
    alpha = jnp.float32(0.1)

    # Warm-up / compile, with a readback fence.
    ema1, *_ = step(iq, ema, alpha)
    _ = np.asarray(ema1[:1, :8])

    def timed(iters: int) -> float:
        e = ema
        t0 = time.perf_counter()
        for _ in range(iters):
            e, frames, sync, score = step(iq, e, alpha)
        # The EMA dependency chain serialises all iterations; materialising a
        # slice of the final image is therefore a full fence.
        _ = np.asarray(e[:1, :8])
        return time.perf_counter() - t0

    timed(2)  # settle
    iters = 24  # amortises the tunnel's ~24 ms per-sync round trip
    dt = timed(iters)

    msps = n * iters / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "full-chain IQ throughput at 1080p60 (int16 ingest + demod + resample + sync + EMA)",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
