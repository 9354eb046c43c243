"""Round-4 probe: int8-quantised envelope rows for the select einsum.

VERDICT r3 #6: the select stage measured 2.1 ms of the 36f block and the
round-4 roofline puts it at ~77% of the bf16 MXU roof (exp_r4_roofline) —
the only remaining lever at this formulation is the int8 MXU path (2x the
bf16 throughput on v5e).  Selection itself stays EXACT (one-hot 0/1 int8
times quantised rows, int32 accumulation); the only loss is the per-row
int8 quantisation of the envelope (step = rowmax/127 ≈ 0.4% — far below
the 18 dB capture noise).  Dequantisation rides the same one-hot: the
selected chunk's scale is gathered by a tiny (F,G_o,R)x(F,R) einsum per
column-block shift.

Ladder (full StreamingExactPlan graph, bf16 weights, do_align off, 36f):
  base        production bf16 select
  int8-select quantise rows -> int8 one-hot select -> dequant
Reports chain ms/block and max rel err vs base.
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

    from tempest_tpu.ops.resample import StreamingExactPlan
    from tempest_tpu.pipeline.offline import ReconstructionConfig, demodulate
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = 20e6
    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    F = 36
    cfg = ReconstructionConfig(
        sample_rate=fs, mode=mode, n_frames=F, input_format="iq_interleaved",
        carry_phase=True, subsample_align=True, do_align=False,
        resampler="mxu3", phase_bins=64,
    )
    frame_len = int(np.floor(cfg.samples_per_frame))
    plan = StreamingExactPlan(
        frame_len, cfg.samples_per_frame, F, mode.height, mode.width,
        cfg.render_size, 64, 64, einsum_bf16=True)
    n = cfg.block_samples
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    P = plan.num_phases

    def graph(iqv, m, sel_src, reg_src, blend_idx, int8):
        env = demodulate(iqv, cfg)
        env_m = jax.lax.dynamic_slice(env, (m,), (plan.L0,))
        env_m = jnp.concatenate([
            env_m, jnp.broadcast_to(env_m[-1],
                                    (plan.pad_len - plan.frame_len,)
                                    ).astype(env_m.dtype)])
        frames_sig = jnp.stack([
            jax.lax.slice(env_m, (int(u),), (int(u) + plan.pad_len,))
            for u in plan.u])
        rows = frames_sig.reshape(F, -1, 128)
        if int8:
            scale = jnp.max(jnp.abs(rows), axis=2) / 127.0 + 1e-30  # (F, R')
            q = jnp.round(rows / scale[..., None]).astype(jnp.int8)
            sel_i = (sel_src[..., None] == jnp.arange(
                plan.R, dtype=jnp.int32)).astype(jnp.int8)
            sel_f = sel_i.astype(jnp.float32)
            blocks = []
            for i in range(plan.n_chunks_per_win):
                s_int = jnp.einsum("fgr,frk->fgk", sel_i, q[:, i: plan.R + i],
                                   preferred_element_type=jnp.int32)
                s_scale = jnp.einsum("fgr,fr->fg", sel_f,
                                     scale[:, i: plan.R + i])
                blocks.append(s_int.astype(jnp.float32) * s_scale[..., None])
            S = jnp.concatenate(blocks, axis=2).reshape(
                F, 128, plan.per_o, plan.win_w)
        else:
            rows128 = rows.astype(jnp.bfloat16)
            sel = (sel_src[..., None] == jnp.arange(plan.R, dtype=jnp.int32)
                   ).astype(jnp.bfloat16)
            S = jnp.concatenate(
                [jnp.einsum("fgr,frk->fgk", sel, rows128[:, i: plan.R + i],
                            preferred_element_type=jnp.float32)
                 for i in range(plan.n_chunks_per_win)], axis=2,
            ).reshape(F, 128, plan.per_o, plan.win_w)
        aligned = jnp.concatenate(
            [jax.lax.slice(S, (0, o, 0, o),
                           (F, o + 1, plan.per_o, o + plan.span_w))
             for o in range(128)], axis=1,
        ).reshape(F, 128 * plan.per_o, plan.span_w)
        reg = (reg_src[..., None] == jnp.arange(
            128 * plan.per_o, dtype=jnp.int32)).astype(jnp.bfloat16)
        regrouped = jnp.einsum(
            "fgk,fkw->fgw", reg, aligned.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(F, P, plan.per_p, plan.span_w)
        z = jnp.einsum("fpbs,psw->fpbw", regrouped.astype(jnp.bfloat16),
                       jnp.asarray(plan.weights, jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        G_p = P * plan.per_p
        blend = (
            jnp.asarray(plan.coeff, jnp.float32)[None, :, None]
            * (blend_idx[..., None] == jnp.arange(G_p, dtype=jnp.int32)
               ).astype(jnp.float32)
        ).reshape(F, plan.h_out, 2, G_p).sum(axis=2)
        return jnp.einsum("fhg,fgw->fhw", blend,
                          z.reshape(F, G_p, plan.w_out),
                          preferred_element_type=jnp.float32)

    iters = 24
    phases = [(-i * n) % spf for i in range(iters)]
    dev_tables: dict[int, tuple] = {}

    def tabs_for(p):
        k, m = plan.bin_for_phase(p)
        if k not in dev_tables:
            dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
        return m, dev_tables[k]

    m0, tabs0 = tabs_for(phases[1])
    a = np.asarray(jax.jit(lambda *xs: graph(*xs, False))(
        iq, jnp.int32(m0), *tabs0))
    b = np.asarray(jax.jit(lambda *xs: graph(*xs, True))(
        iq, jnp.int32(m0), *tabs0))
    rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-30))
    print(json.dumps({"int8_rel_maxdiff": rel}), flush=True)

    for name, int8 in (("base-bf16", False), ("int8-select", True)):
        fn = jax.jit(lambda iqv, carry, m, s, r, bi, _q=int8:
                     carry + jnp.sum(graph(iqv, m, s, r, bi, _q) * 1e-9))

        def run():
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for p in phases:
                m, tabs = tabs_for(p)
                c = fn(iq, c, jnp.int32(m), *tabs)
            _ = float(c)
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        run()
        best = min(run(), run()) / iters * 1e3
        print(json.dumps({"variant": name,
                          "ms_per_block": round(best, 2),
                          "msps": round(n / best / 1e3, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
