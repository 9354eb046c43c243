"""Round-3 probe: is the mxu4 formulation (delta-kernel conv alignment, no
offset grouping — G = P*per_p rows instead of 128*per_o) competitive with
mxu3 on this backend?  Informs whether a tables-variant of mxu4 could shrink
the select stage's one-hot traffic (the attribution's remaining headroom).

Full offline chain at 12f, resampler mxu3 vs mxu4, chained protocol.
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
    for resampler in ("mxu3", "mxu4"):
        cfg = ReconstructionConfig(
            sample_rate=fs, mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
            n_frames=12, input_format="iq_interleaved", resampler=resampler,
        )
        step = make_reconstruct_fn(cfg)
        n = cfg.block_samples
        iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
        ema = jnp.zeros(cfg.render_size, jnp.float32)
        t0 = time.perf_counter()
        e, *_ = step(iq, ema, jnp.float32(0.1))
        _ = np.asarray(e[:1, :8])
        compile_s = time.perf_counter() - t0
        iters = 24

        def timed():
            e = ema
            t0 = time.perf_counter()
            for _ in range(iters):
                e, *_ = step(iq, e, jnp.float32(0.1))
            _ = np.asarray(e[:1, :8])
            return time.perf_counter() - t0

        timed()
        best = min(timed(), timed())
        print(json.dumps({
            "resampler": resampler,
            "compile_s": round(compile_s, 1),
            "ms_per_block": round(best / iters * 1e3, 2),
            "msps": round(n * iters / best / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
