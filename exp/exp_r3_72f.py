"""Round-3: does the tables chain keep scaling past 36 frames?

The round-2 offline chain regressed ~4% at 72f; the tables formulation has
different traffic (per-frame one-hots, bigger activations) so re-measure.
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

    from tempest_tpu.pipeline.offline import ReconstructionConfig, make_reconstruct_fn
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    rng = np.random.default_rng(0)
    for n_frames, do_align in ((72, False), (72, True)):
        cfg = ReconstructionConfig(
            sample_rate=fs, mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
            n_frames=n_frames, input_format="iq_interleaved",
            carry_phase=True, subsample_align=True, do_align=do_align,
            resampler="mxu3", phase_bins=64,
        )
        step = make_reconstruct_fn(cfg)
        n = cfg.block_samples
        spf = cfg.samples_per_frame
        iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
        ema = jnp.zeros(cfg.render_size, jnp.float32)
        iters = 16
        phases = [(-i * n) % spf for i in range(iters)]
        t0 = time.perf_counter()
        e, *_ = step(iq, ema, jnp.float32(0.1), phases[0])
        _ = np.asarray(e[:1, :8])
        compile_s = time.perf_counter() - t0

        def timed():
            e = ema
            t0 = time.perf_counter()
            for p in phases:
                e, *_ = step(iq, e, jnp.float32(0.1), p)
            _ = np.asarray(e[:1, :8])
            return time.perf_counter() - t0

        timed()
        best = min(timed(), timed())
        print(json.dumps({
            "case": f"tables {n_frames}f sync={do_align}",
            "compile_s": round(compile_s, 1),
            "ms_per_block": round(best / iters * 1e3, 2),
            "msps": round(n * iters / best / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
