"""Round-3 probe: stop returning the per-frame stack from the streaming step.

The production step returns ``(ema, frames, sync, score)`` — ``frames`` is
(36, 1080, 1920) f32 ≈ 298 MB that must materialise at the jit boundary and
be re-read by the EMA fold, although the streaming loop only ever consumes
the EMA (frames are used for a static count and the optional per-frame
emit).  Returning only ``(ema, sync, score)`` lets XLA fuse the blend
einsum straight into the EMA fold's frame-axis reduction
(``Σ_f w_f · blend_f @ z_f``) and never build the stack.

Variants at the judged config (36f, both sync on — the bench chain — and
off): production outputs vs ema-only outputs.  Equality of the EMA asserted
exactly (same contractions, f32 reassociation only through ema_fold's
already-used path).
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
        _make_sync_one,
        demodulate,
        ema_fold,
    )
    from tempest_tpu.ops.resample import StreamingExactPlan
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = float(os.environ.get("TT_EXP_FS", 20e6))
    mode = ALL_VIDEO_MODES[os.environ.get("TT_EXP_MODE", "1920x1080 @ 60Hz")]
    F = int(os.environ.get("TT_EXP_F", 36))
    rng = np.random.default_rng(0)

    for do_align in (False, True):
        cfg = ReconstructionConfig(
            sample_rate=fs, mode=mode, n_frames=F,
            input_format="iq_interleaved", carry_phase=True,
            subsample_align=True, do_align=do_align, resampler="mxu3",
            phase_bins=64, einsum_bf16=True,
        )
        frame_len = int(np.floor(cfg.samples_per_frame))
        plan = StreamingExactPlan(
            frame_len, cfg.samples_per_frame, F, mode.height, mode.width,
            cfg.render_size, 64, 64, einsum_bf16=True)
        sync_one = _make_sync_one(cfg)
        n = cfg.block_samples
        spf = cfg.samples_per_frame
        iq = jax.device_put(rng.integers(-16384, 16384, 2 * n,
                                         dtype=np.int16))

        def step_full(iqv, ema, alpha, m, sel_src, reg_src, blend_idx):
            env = demodulate(iqv, cfg)
            screens = plan.resample(env, m, sel_src, reg_src, blend_idx)
            frames, sync, score = jax.vmap(sync_one)(screens)
            return ema_fold(ema, frames, alpha), frames, sync, score

        def step_ema(iqv, ema, alpha, m, sel_src, reg_src, blend_idx):
            env = demodulate(iqv, cfg)
            screens = plan.resample(env, m, sel_src, reg_src, blend_idx)
            frames, sync, score = jax.vmap(sync_one)(screens)
            return ema_fold(ema, frames, alpha), sync, score

        f_full = jax.jit(step_full)
        f_ema = jax.jit(step_ema)

        iters = int(os.environ.get("TT_EXP_ITERS", 24))
        phases = [(-i * n) % spf for i in range(iters)]
        dev_tables: dict[int, tuple] = {}

        def tabs_for(p):
            k, m = plan.bin_for_phase(p)
            if k not in dev_tables:
                dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
            return m, dev_tables[k]

        ema0 = jnp.zeros(cfg.render_size, jnp.float32)
        al = jnp.float32(0.1)
        m0, tabs0 = tabs_for(phases[1])
        a = np.asarray(f_full(iq, ema0, al, jnp.int32(m0), *tabs0)[0])
        b = np.asarray(f_ema(iq, ema0, al, jnp.int32(m0), *tabs0)[0])
        err = float(np.max(np.abs(a - b)))
        print(json.dumps({"do_align": do_align, "ema_max_abs_err": err}),
              flush=True)

        for name, fn in (("full-outputs", f_full), ("ema-only", f_ema)):
            def run(fn=fn):
                e = ema0
                t0 = time.perf_counter()
                for p in phases:
                    m, tabs = tabs_for(p)
                    out = fn(iq, e, al, jnp.int32(m), *tabs)
                    e = out[0]
                _ = np.asarray(e[:1, :8])
                return time.perf_counter() - t0

            t0 = time.perf_counter()
            run()
            compile_s = time.perf_counter() - t0
            run()
            best = min(run(), run()) / iters * 1e3
            print(json.dumps({
                "do_align": do_align, "variant": name,
                "ms_per_block": round(best, 2),
                "msps": round(n / best / 1e3, 1),
                "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
