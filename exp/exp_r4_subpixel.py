"""Round-4: sub-pixel registration at (near-)headline speed.

VERDICT r3 weak #3: the PSNR-leading chain (sub-pixel sync, +0.4-0.5 dB)
costs 9.25 ms/36f vs the judged 7.62 — the overhead being
``align_frame_subpixel``'s 4-8 dynamic full-image rolls per frame.  This
A/B measures the new matmul registration (circulant shift operators built
on device from the traced offsets, ``S_y @ frame @ S_x^T`` on the MXU —
``ops.framesync.shift_matrix``) against the roll formulation, on the exact
judged program (36f 1080p60 quantised-tables chain, sync ON, phases
cycling, chained-EMA readback protocol of bench.py).

Also reports the on-device output difference between the two impls (the
matmul rides bf16 MXU passes at DEFAULT precision; CPU f32 agreement is
≤1.5e-7 relative) and the integer-sync baseline for context.
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

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tempest_tpu.pipeline.offline import (ReconstructionConfig,
                                              make_reconstruct_fn)
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    F = 36
    base = dict(
        sample_rate=fs, mode=ALL_VIDEO_MODES["1920x1080 @ 60Hz"],
        n_frames=F, input_format="iq_interleaved", carry_phase=True,
        subsample_align=True, do_align=True, resampler="mxu3",
        phase_bins=64, einsum_bf16=True,
    )
    variants = {
        "sync-int (judged)": dict(),
        "subpix-roll": dict(align_subpixel=True, align_impl="roll"),
        "subpix-matmul": dict(align_subpixel=True, align_impl="matmul"),
        "subpix-matmul-cubic": dict(align_subpixel=True, align_impl="matmul",
                                    align_interp="cubic"),
    }

    rng = np.random.default_rng(0)
    cfg0 = ReconstructionConfig(**base)
    n = cfg0.block_samples
    spf = cfg0.samples_per_frame
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    ema0 = jnp.zeros(cfg0.render_size, jnp.float32)
    alpha = jnp.float32(0.1)
    iters = 24
    phases = [(-i * n) % spf for i in range(iters)]

    results = {}
    finals = {}
    for name, over in variants.items():
        cfg = ReconstructionConfig(**{**base, **over})
        step = make_reconstruct_fn(cfg)
        t0 = time.perf_counter()
        e, *_ = step(iq, ema0, alpha, phases[0])
        _ = np.asarray(e[:1, :8])
        compile_s = time.perf_counter() - t0

        def timed():
            e = ema0
            t0 = time.perf_counter()
            for p in phases:
                e, *_ = step(iq, e, alpha, p)
            out = np.asarray(e)
            return time.perf_counter() - t0, out

        timed()  # settle (device tables warm)
        best, final = min(((timed()) for _ in range(3)), key=lambda t: t[0])
        ms = best / iters * 1e3
        msps = n / (ms / 1e3) / 1e6
        results[name] = (ms, msps, compile_s)
        finals[name] = final
        print(json.dumps({
            "variant": name, "ms_per_block": round(ms, 3),
            "msps": round(msps, 1), "compile_s": round(compile_s, 1),
        }), flush=True)

    # Output agreement: matmul vs roll on the SAME inputs (bf16 MXU passes
    # vs VPU f32 adds).
    a, b = finals["subpix-roll"], finals["subpix-matmul"]
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
    print(json.dumps({"matmul_vs_roll_rel_maxdiff": float(rel)}), flush=True)


if __name__ == "__main__":
    main()
