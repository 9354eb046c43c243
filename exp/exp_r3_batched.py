"""Round-3 experiment: batched serving — fused vs vmapped, vs single stream.

Round 2 measured the vmapped 4-stream 12f program at 1164 Msps aggregate
with a 192 s compile, below the 36f single-stream headline (1310/1540).
The fused program (all B·F frames through one resample/sync batch, EMA as
one einsum) is hypothesised to re-tile the small einsums once instead of
per stream.  Protocol: chained EMA carry, one readback fence, min of two
24-iteration passes.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(name, make_step, n_total_samples, call):
    import jax.numpy as jnp  # noqa: F401

    t0 = time.perf_counter()
    e = call(None)
    _ = np.asarray(e[:1, :1] if e.ndim == 2 else e[:1, :1, :1])
    t_compile = time.perf_counter() - t0
    iters = 24

    def timed():
        ee = None
        t0 = time.perf_counter()
        for _ in range(iters):
            ee = call(ee)
        _ = np.asarray(ee[:1, :1] if ee.ndim == 2 else ee[:1, :1, :1])
        return time.perf_counter() - t0

    timed()
    best = min(timed(), timed())
    rec = {
        "case": name,
        "compile_s": round(t_compile, 1),
        "ms_per_dispatch": round(best / iters * 1e3, 2),
        "msps_aggregate": round(n_total_samples * iters / best / 1e6, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import (
        ReconstructionConfig,
        make_batched_reconstruct_fn,
        make_reconstruct_fn,
    )
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    rng = np.random.default_rng(0)
    out = []
    for n_frames, B in ((12, 4), (36, 4)):
        cfg = ReconstructionConfig(
            sample_rate=fs, mode=mode, n_frames=n_frames,
            input_format="iq_interleaved",
        )
        n = cfg.block_samples
        iq_b = jax.device_put(
            rng.integers(-16384, 16384, (B, 2 * n), dtype=np.int16))
        ema_b = jnp.zeros((B, *cfg.render_size), jnp.float32)
        alpha = jnp.float32(0.1)
        for fuse in (True, False):
            step = make_batched_reconstruct_fn(cfg, fuse=fuse)

            def call(e, step=step):
                e = ema_b if e is None else e
                e2, *_ = step(iq_b, e, alpha)
                return e2

            out.append(run_case(
                f"{'fused' if fuse else 'vmap'} {B}x{n_frames}f",
                None, B * n, call))
    # single-stream 12f reference point in the same session
    cfg1 = ReconstructionConfig(
        sample_rate=fs, mode=mode, n_frames=12,
        input_format="iq_interleaved",
    )
    step1 = make_reconstruct_fn(cfg1)
    n1 = cfg1.block_samples
    iq1 = jax.device_put(rng.integers(-16384, 16384, 2 * n1, dtype=np.int16))
    ema1 = jnp.zeros(cfg1.render_size, jnp.float32)

    def call1(e):
        e = ema1 if e is None else e
        e2, *_ = step1(iq1, e, jnp.float32(0.1))
        return e2

    out.append(run_case("single 1x12f", None, n1, call1))
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
