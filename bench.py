"""End-to-end benchmark: IQ Msamples/s per chip through the full TEMPEST
reconstruction chain at 1920x1080@60 (the BASELINE.md primary config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the real-time factor against the reference's recommended
20 Msps live bandwidth (docs/src/install.md:24) — 1.0 means the chain keeps up
with a 20 MHz SDR in real time, the reference's own operating point.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import ReconstructionConfig, make_reconstruct_fn
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    config = ReconstructionConfig(
        sample_rate=fs,
        mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
        n_frames=6,
    )
    step = make_reconstruct_fn(config)

    rng = np.random.default_rng(0)
    n = config.block_samples
    iq = jax.device_put(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    )
    ema = jnp.zeros(config.render_size, jnp.float32)
    alpha = jnp.float32(0.1)

    # Warm-up / compile.
    ema, *_ = step(iq, ema, alpha)
    jax.block_until_ready(ema)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        ema, frames, sync, score = step(iq, ema, alpha)
    jax.block_until_ready(ema)
    dt = time.perf_counter() - t0

    samples_per_s = n * iters / dt
    msps = samples_per_s / 1e6
    print(
        json.dumps(
            {
                "metric": "full-chain IQ throughput at 1080p60 (demod+resample+sync+EMA)",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
