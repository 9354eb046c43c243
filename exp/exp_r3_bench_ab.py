"""Same-session A/B of bench.py's judged chain: einsum_bf16 off vs on.

Cross-session bench numbers on the tunnelled TPU wobble ~±1-2%, which can
swallow the ladder's 0.14 ms (exp_r3_regroup_bf16 measured the rung with
sync OFF).  This measures the exact bench.py program (36f, sync on,
carry-phase streaming tables) at both settings in ONE session, interleaved
A/B/A/B, reporting per-pass minima.
"""

import dataclasses
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
    base = ReconstructionConfig(
        sample_rate=fs, mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
        n_frames=36, input_format="iq_interleaved", carry_phase=True,
        subsample_align=True, do_align=True, resampler="mxu3", phase_bins=64,
    )
    steps = {
        "f32": make_reconstruct_fn(base),
        "bf16": make_reconstruct_fn(dataclasses.replace(base,
                                                        einsum_bf16=True)),
    }
    rng = np.random.default_rng(0)
    n = base.block_samples
    spf = base.samples_per_frame
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    ema0 = jnp.zeros(base.render_size, jnp.float32)
    alpha = jnp.float32(0.1)
    iters = 24
    phases = [(-i * n) % spf for i in range(iters)]

    def run(step):
        e = ema0
        t0 = time.perf_counter()
        for p in phases:
            e, *_ = step(iq, e, alpha, p)
        _ = np.asarray(e[:1, :8])
        return time.perf_counter() - t0

    for name, step in steps.items():
        t0 = time.perf_counter()
        run(step)
        print(json.dumps({"compiled": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    best = {k: [] for k in steps}
    for _ in range(3):                      # interleaved A/B passes
        for name, step in steps.items():
            best[name].append(run(step))
    for name, ts in best.items():
        ms = min(ts) / iters * 1e3
        print(json.dumps({"variant": name, "ms_per_block": round(ms, 3),
                          "msps": round(n / ms / 1e3, 1),
                          "all_ms": [round(t / iters * 1e3, 3) for t in ts]}),
              flush=True)


if __name__ == "__main__":
    main()
