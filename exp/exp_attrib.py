"""Per-stage attribution of the mxu3 12-frame 1080p60 block (TPU).

Each stage runs as its own jitted program with a dependency-chained carry
(zero-valued scalar derived from the output folded into the next input) and
ONE readback fence, so per-call dispatch overhead is charged the same way as
the full-chain bench.  Appends one JSON line per stage to
exp_r2_results.jsonl.

Usage: timeout 3000 python exp_attrib.py > exp_attrib.log 2>&1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

RESULTS = "exp_r2_results.jsonl"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(row):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"RESULT {row}")


def bench(name, step, x0, iters=24):
    """step(x, c) -> (out, c'); x0 device array; times chained calls."""
    import jax.numpy as jnp

    c0 = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    out, c = step(x0, c0)
    _ = np.asarray(out.ravel()[:8])
    compile_s = time.perf_counter() - t0

    def timed(k):
        c = c0
        t0 = time.perf_counter()
        for _ in range(k):
            out, c = step(x0, c)
        _ = np.asarray(out.ravel()[:8])
        return time.perf_counter() - t0

    timed(2)
    dt = timed(iters)
    ms = dt / iters * 1e3
    record({"stage": name, "ms_per_call": round(ms, 3),
            "compile_s": round(compile_s, 1)})
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from tempest_tpu.ops.demod import am_envelope_from_iq
    from tempest_tpu.ops.framesync import align_frame, frame_sync
    from tempest_tpu.ops.resample import frame_to_screen_mxu3
    from tempest_tpu.pipeline.offline import ReconstructionConfig, ema_fold
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    cfg = ReconstructionConfig(
        sample_rate=20e6, mode=mode, n_frames=12, input_format="iq_interleaved"
    )
    n = cfg.block_samples
    frame_len = int(np.floor(cfg.samples_per_frame))
    rng = np.random.default_rng(0)
    h, w = cfg.render_size

    # Device-resident inputs per stage.
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    env = jax.device_put(rng.random(n).astype(np.float32))
    starts = np.round(np.arange(12) * cfg.samples_per_frame).astype(np.int32)
    frames_sig = jax.device_put(
        np.stack([np.asarray(rng.random(frame_len), np.float32)
                  for _ in range(12)]))
    screens = jax.device_put(rng.random((12, h, w)).astype(np.float32))
    ema0 = jax.device_put(rng.random((h, w)).astype(np.float32))

    # 1. ingest + demod (int16 words -> f32 envelope).
    @jax.jit
    def s_demod(x, c):
        e = am_envelope_from_iq(x) + c
        return e, e[0] * 0.0

    bench("demod_12f", s_demod, iq)

    # 2. frame cut (dynamic slices out of the envelope).
    @jax.jit
    def s_cut(e, c):
        e = e + c
        fr = jnp.stack([
            jax.lax.dynamic_slice(e, (int(s),), (frame_len,)) for s in starts
        ])
        return fr, fr[0, 0] * 0.0

    bench("cut_12f", s_cut, env)

    # 3. resample only (12 frames, mxu3).
    @jax.jit
    def s_resample(fr, c):
        sc = jax.vmap(
            lambda s: frame_to_screen_mxu3(s + c, mode.height, mode.width, (h, w))
        )(fr)
        return sc, sc[0, 0, 0] * 0.0

    bench("resample_mxu3_12f", s_resample, frames_sig)

    # 4. sync + align only (12 screens).
    @jax.jit
    def s_sync(sc, c):
        def one(s):
            s_y, s_x, score = frame_sync(s + c)
            return align_frame(s, s_y, s_x)

        out = jax.vmap(one)(sc)
        return out, out[0, 0, 0] * 0.0

    bench("sync_align_12f", s_sync, screens)

    # 5. EMA fold only.
    @jax.jit
    def s_ema(sc, c):
        out = ema_fold(ema0 + c, sc, jnp.float32(0.1))
        return out, out[0, 0] * 0.0

    bench("ema_fold_12f", s_ema, screens)


if __name__ == "__main__":
    main()
