"""Round-3: batched carry-phase fidelity serving throughput (4 streams).

Per-stream quantised bins; all K bins' tables device-resident, gathered on
device by the traced per-stream bin indices — zero per-block table uploads.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import (
        ReconstructionConfig,
        make_batched_reconstruct_fn,
    )
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    B = 4
    for F in (12,):
        cfg = ReconstructionConfig(
            sample_rate=fs, mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
            n_frames=F, input_format="iq_interleaved", carry_phase=True,
            subsample_align=True, do_align=False, resampler="mxu3",
            phase_bins=64,
        )
        n = cfg.block_samples
        spf = cfg.samples_per_frame
        rng = np.random.default_rng(0)
        iq = jax.device_put(
            rng.integers(-16384, 16384, (B, 2 * n), dtype=np.int16))
        ema = jnp.zeros((B, *cfg.render_size), jnp.float32)
        alpha = jnp.float32(0.1)
        step = make_batched_reconstruct_fn(cfg)
        iters = 24
        # per-stream phases advance independently (distinct offsets).
        phase_sets = [
            [(-i * n + 1000 * b) % spf for b in range(B)]
            for i in range(iters)
        ]
        t0 = time.perf_counter()
        e, *_ = step(iq, ema, alpha, phase_sets[0])
        _ = np.asarray(e[:1, :1, :8])
        compile_s = time.perf_counter() - t0

        def timed():
            e = ema
            t0 = time.perf_counter()
            for ps in phase_sets:
                e, *_ = step(iq, e, alpha, ps)
            _ = np.asarray(e[:1, :1, :8])
            return time.perf_counter() - t0

        timed()
        best = min(timed(), timed())
        print(json.dumps({
            "case": f"batched fidelity {B}x{F}f",
            "compile_s": round(compile_s, 1),
            "ms_per_dispatch": round(best / iters * 1e3, 2),
            "msps_aggregate": round(B * n * iters / best / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
