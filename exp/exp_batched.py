"""Multi-stream batched serving throughput (TPU): B independent IQ channels
through one vmapped reconstruct step (make_batched_reconstruct_fn).

Measures aggregate Msps across streams with the chained-EMA fence
methodology; appends JSON lines to exp_r2_results.jsonl.

Usage: timeout 3000 python exp_batched.py [B n_frames]...  (default 4x6f, 2x12f)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

RESULTS = "exp_r2_results.jsonl"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(row):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"RESULT {row}")


def run(batch, n_frames, iters=12):
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import (
        ReconstructionConfig,
        make_batched_reconstruct_fn,
    )
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    cfg = ReconstructionConfig(
        sample_rate=20e6, mode=mode, n_frames=n_frames,
        input_format="iq_interleaved",
    )
    step = make_batched_reconstruct_fn(cfg)
    rng = np.random.default_rng(0)
    n = cfg.block_samples
    iq = jax.device_put(
        rng.integers(-16384, 16384, (batch, 2 * n), dtype=np.int16))
    ema = jnp.zeros((batch, *cfg.render_size), jnp.float32)
    alpha = jnp.float32(0.1)

    t0 = time.perf_counter()
    out = step(iq, ema, alpha)
    _ = np.asarray(out[0][:1, :1, :8])
    compile_s = time.perf_counter() - t0
    log(f"B{batch}x{n_frames}f: compiled+first-step in {compile_s:.1f} s")

    def timed(k):
        e = ema
        t0 = time.perf_counter()
        for _ in range(k):
            e, *_ = step(iq, e, alpha)
        _ = np.asarray(e[:1, :1, :8])
        return time.perf_counter() - t0

    timed(2)
    dt = timed(iters)
    ms_block = dt / iters * 1e3
    msps = batch * n * iters / dt / 1e6
    record({
        "variant": f"batched{batch}x{n_frames}f", "batch": batch,
        "n_frames": n_frames, "ms_per_block": round(ms_block, 2),
        "msps_aggregate": round(msps, 2), "compile_s": round(compile_s, 1),
    })


def main():
    import jax  # noqa: F401

    specs = sys.argv[1:] or ["4x6", "2x12"]
    for s in specs:
        b, f = s.split("x")
        try:
            run(int(b), int(f))
        except Exception as e:  # noqa: BLE001
            record({"variant": f"batched{s}f", "error": f"{type(e).__name__}: {e}"[:400]})


if __name__ == "__main__":
    main()
