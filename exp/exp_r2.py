"""Round-2 TPU experiments: resampler/frame-loop variants at 1080p60.

Runs each variant through the full reconstruct step (int16 interleaved
ingest), chained-EMA fence methodology (CLAUDE.md), one JSON line per result
appended to exp_r2_results.jsonl as each finishes (remote compiles are
minutes each — incremental output survives a timeout).

Usage: timeout 5400 python exp_r2.py [variant ...] > exp_r2.log 2>&1
Variants default to the full list below.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
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


def run_variant(name, cfg, fs, iters=12):
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import make_reconstruct_fn

    step = make_reconstruct_fn(cfg)
    rng = np.random.default_rng(0)
    n = cfg.block_samples
    words = rng.integers(-16384, 16384, 2 * n, dtype=np.int16)
    if cfg.input_format == "iq_planar":
        words = np.ascontiguousarray(words.reshape(-1, 2).T)
    iq = jax.device_put(words)
    ema = jnp.zeros(cfg.render_size, jnp.float32)
    alpha = jnp.float32(0.1)

    t0 = time.perf_counter()
    out = step(iq, ema, alpha)
    _ = np.asarray(out[0][:1, :8])
    compile_s = time.perf_counter() - t0
    log(f"{name}: compiled+first-step in {compile_s:.1f} s")

    def timed(k):
        e = ema
        t0 = time.perf_counter()
        for _ in range(k):
            e, *_ = step(iq, e, alpha)
        _ = np.asarray(e[:1, :8])
        return time.perf_counter() - t0

    timed(2)  # settle
    dt = timed(iters)
    ms_block = dt / iters * 1e3
    msps = n * iters / dt / 1e6
    record({
        "variant": name, "resampler": cfg.resampler, "segments": cfg.segments,
        "frame_loop": cfg.frame_loop, "n_frames": cfg.n_frames, "fs": fs,
        "do_align": cfg.do_align, "ms_per_block": round(ms_block, 2),
        "msps": round(msps, 2), "compile_s": round(compile_s, 1),
    })
    return msps


def main():
    import jax  # noqa: F401  (device init before timing)

    from tempest_tpu.pipeline.offline import ReconstructionConfig
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]

    def cfg(fs=20e6, **kw):
        kw.setdefault("input_format", "iq_interleaved")
        return ReconstructionConfig(sample_rate=fs, mode=mode, **kw)

    variants = {
        # Default config re-measure (round-1 baseline: 10.3 ms / 194 Msps) —
        # now with slice-based sync scores + blend-matmul deindex.
        "mxu_6f": (cfg(n_frames=6), 20e6),
        # + phase-sort permutation as one-hot matmul (no row gather).
        "mxu2_6f": (cfg(n_frames=6, resampler="mxu2"), 20e6),
        # zero-gather resampler: chunk select + align + regroup as one-hot
        # matmuls / static slices.
        "mxu3_6f": (cfg(n_frames=6, resampler="mxu3"), 20e6),
        "mxu3_12f": (cfg(n_frames=12, resampler="mxu3"), 20e6),
        # host-planar ingest: device does only contiguous elementwise demod.
        "mxu3_12f_planar": (
            cfg(n_frames=12, resampler="mxu3", input_format="iq_planar"),
            20e6),
        "mxu3_18f_planar": (
            cfg(n_frames=18, resampler="mxu3", input_format="iq_planar"),
            20e6),
        "mxu4_12f": (cfg(n_frames=12, resampler="mxu4"), 20e6),
        "mxu3_18f": (cfg(n_frames=18, resampler="mxu3"), 20e6),
        "mxu3_24f": (cfg(n_frames=24, resampler="mxu3"), 20e6),
        "mxu3_36f": (cfg(n_frames=36, resampler="mxu3"), 20e6),
        "mxu3_72f": (cfg(n_frames=72, resampler="mxu3"), 20e6),
        "mxu3_36f_nosync": (
            cfg(n_frames=36, resampler="mxu3", do_align=False), 20e6),
        # weight-streaming levers on the now-dominant resample stage.
        "mxu3_36f_bf16w": (
            cfg(n_frames=36, resampler="mxu3", einsum_bf16=True), 20e6),
        "mxu3_36f_p32": (
            cfg(n_frames=36, resampler="mxu3", num_phases=32), 20e6),
        "mxu3_36f_p32_bf16w": (
            cfg(n_frames=36, resampler="mxu3", num_phases=32,
                einsum_bf16=True), 20e6),
        # fidelity chain (sub-sample-exact cuts) at the new ingest.
        "gather_12f_subsample": (
            cfg(n_frames=12, resampler="gather", subsample_align=True,
                do_align=False), 20e6),
        # exact cuts on the mxu3 matmul tables (block-level, static offsets).
        "mxu3_12f_exact": (
            cfg(n_frames=12, resampler="mxu3", subsample_align=True,
                do_align=False), 20e6),
        "mxu3_36f_exact": (
            cfg(n_frames=36, resampler="mxu3", subsample_align=True,
                do_align=False), 20e6),
        # subpixel registration cost on the throughput chain.
        "mxu3_12f_subpixel": (
            cfg(n_frames=12, resampler="mxu3", align_subpixel=True), 20e6),
        # the fidelity flagship: exact cuts + sub-pixel registration.
        "mxu3_12f_exact_subpixel": (
            cfg(n_frames=12, resampler="mxu3", subsample_align=True,
                align_subpixel=True), 20e6),
        "mxu3_24f_planar": (
            cfg(n_frames=24, resampler="mxu3", input_format="iq_planar"),
            20e6),
        # attribution: mxu3 without the sync stage.
        "mxu3_6f_nosync": (
            cfg(n_frames=6, resampler="mxu3", do_align=False), 20e6),
        # Default at a large block via scan (compile-light) — the headline
        # candidate: per-block overhead amortised over 36 frames.
        "mxu_scan_36f_b": (
            cfg(n_frames=36, resampler="mxu", frame_loop="scan"), 20e6),
        # Segmented batched einsum, presorted gather: small spans + weights.
        "seg4_6f": (cfg(n_frames=6, resampler="mxu_batched", segments=4), 20e6),
        # Same at a large block: per-block overhead amortised, ops scale in
        # SIZE not count so compile should stay moderate.
        "seg4_36f": (cfg(n_frames=36, resampler="mxu_batched", segments=4), 20e6),
        # scan frame loop at a large block: compile-light by construction.
        "mxu_scan_36f": (
            cfg(n_frames=36, resampler="mxu", frame_loop="scan"), 20e6),
        # sync cost attribution at scale.
        "seg4_36f_nosync": (
            cfg(n_frames=36, resampler="mxu_batched", segments=4,
                do_align=False), 20e6),
        # seg2 variant for the gather-row-count sensitivity question.
        "seg2_6f": (cfg(n_frames=6, resampler="mxu_batched", segments=2), 20e6),
        # Gather-free spectral resampler at a smooth rate (19.44 Msps ->
        # frame_len 324000 = 2^5*3^4*5^3, m_out 432000 = 2^7*3^3*5^3).
        # LAST: non-smooth-FFT lowering risk could hang the remote compiler.
        "fft_6f_smooth": (cfg(fs=19.44e6, n_frames=6, resampler="fft"), 19.44e6),
    }
    names = sys.argv[1:] or list(variants)
    for name in names:
        c, fs = variants[name]
        try:
            run_variant(name, c, fs)
        except Exception as e:  # noqa: BLE001 — keep measuring the rest
            record({"variant": name, "error": f"{type(e).__name__}: {e}"[:400]})


if __name__ == "__main__":
    main()
