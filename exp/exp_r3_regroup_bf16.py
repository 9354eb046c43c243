"""Round-3 probe: run the phase-regroup matmul in pure bf16 — losslessly.

Every element of ``aligned`` is a single envelope sample that already went
through the bf16 one-hot select (bf16 envelope × 1.0 accumulated in f32), so
its value IS a bf16 number stored in f32 — casting it back to bf16 is exact.
The regroup one-hot is 0/1 (exact in bf16).  Today the regroup runs as an
f32×f32 contraction (lowered to multi-pass bf16 on the MXU) with a
(F, G_p, G_o) f32 one-hot operand — ~427 MB at 36f/1080p60; bf16 halves the
operand and drops to one MXU pass for bit-identical output.

The same argument extends one stage: ``regrouped`` is a permutation of
``aligned`` (one-hot rows), so its elements are ALSO exact bf16 values — the
weights einsum can take it in bf16 losslessly; only casting the *weights*
tensor itself (and the blend coefficients) rounds anything (~0.2% on
interpolation coefficients).  Those two are measured as separate rungs with
the output delta reported, not asserted zero.

Variants (full StreamingExactPlan graph with the production chunk select;
do_align off, 36f, judged config):
  f32-regroup     current: reg f32, aligned f32, weights f32, blend f32
  bf16-regroup    reg+aligned bf16 (exact), weights/blend f32
  bf16-weights    + regrouped/weights bf16 in the z einsum (weights rounded)
  bf16-blend      + blend matmul in bf16 (z and coefficients rounded)
Regroup equivalence asserted exactly (max abs err must be 0.0).
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

    from tempest_tpu.ops.resample import StreamingExactPlan
    from tempest_tpu.pipeline.offline import ReconstructionConfig, demodulate
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    fs = float(os.environ.get("TT_EXP_FS", 20e6))
    mode = ALL_VIDEO_MODES[os.environ.get("TT_EXP_MODE", "1920x1080 @ 60Hz")]
    F = int(os.environ.get("TT_EXP_F", 36))
    cfg = ReconstructionConfig(
        sample_rate=fs, mode=mode, n_frames=F, input_format="iq_interleaved",
        carry_phase=True, subsample_align=True, do_align=False,
        resampler="mxu3", phase_bins=64,
    )
    frame_len = int(np.floor(cfg.samples_per_frame))
    plan = StreamingExactPlan(
        frame_len, cfg.samples_per_frame, F, mode.height, mode.width,
        cfg.render_size, 64, 64)
    n = cfg.block_samples
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    P = plan.num_phases

    def graph(iqv, m, sel_src, reg_src, blend_idx, level):
        # level: 0 = all f32 (current), 1 = bf16 regroup (exact),
        #        2 = + bf16 weights einsum, 3 = + bf16 blend matmul.
        bf16_regroup = level >= 1
        env = demodulate(iqv, cfg)
        env_m = jax.lax.dynamic_slice(env, (m,), (plan.L0,))
        env_m = jnp.concatenate([
            env_m, jnp.broadcast_to(env_m[-1],
                                    (plan.pad_len - plan.frame_len,))])
        frames_sig = jnp.stack([
            jax.lax.slice(env_m, (int(u),), (int(u) + plan.pad_len,))
            for u in plan.u])
        rows128 = frames_sig.reshape(F, -1, 128).astype(jnp.bfloat16)
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
        if bf16_regroup:
            reg = (reg_src[..., None] == jnp.arange(
                128 * plan.per_o, dtype=jnp.int32)).astype(jnp.bfloat16)
            regrouped = jnp.einsum(
                "fgk,fkw->fgw", reg, aligned.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).reshape(F, P, plan.per_p, plan.span_w)
        else:
            reg = (reg_src[..., None] == jnp.arange(
                128 * plan.per_o, dtype=jnp.int32)).astype(jnp.float32)
            regrouped = jnp.einsum(
                "fgk,fkw->fgw", reg, aligned,
                preferred_element_type=jnp.float32,
            ).reshape(F, P, plan.per_p, plan.span_w)
        if level >= 2:
            z = jnp.einsum("fpbs,psw->fpbw", regrouped.astype(jnp.bfloat16),
                           jnp.asarray(plan.weights, jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            z = jnp.einsum("fpbs,psw->fpbw", regrouped,
                           jnp.asarray(plan.weights),
                           preferred_element_type=jnp.float32)
        G_p = P * plan.per_p
        bl_dt = jnp.bfloat16 if level >= 3 else jnp.float32
        blend = (
            jnp.asarray(plan.coeff, bl_dt)[None, :, None]
            * (blend_idx[..., None] == jnp.arange(G_p, dtype=jnp.int32)
               ).astype(bl_dt)
        ).reshape(F, plan.h_out, 2, G_p).sum(axis=2)
        return jnp.einsum("fhg,fgw->fhw", blend,
                          z.reshape(F, G_p, plan.w_out).astype(bl_dt),
                          preferred_element_type=jnp.float32)

    iters = int(os.environ.get("TT_EXP_ITERS", 24))
    phases = [(-i * n) % spf for i in range(iters)]
    dev_tables: dict[int, tuple] = {}

    def tabs_for(p):
        k, m = plan.bin_for_phase(p)
        if k not in dev_tables:
            dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
        return m, dev_tables[k]

    # Output deltas per rung; the regroup rung must be EXACT.
    m0, tabs0 = tabs_for(phases[1])
    a = np.asarray(jax.jit(lambda *xs: graph(*xs, 0))(
        iq, jnp.int32(m0), *tabs0))
    scale = max(float(np.max(np.abs(a))), 1e-12)
    for level in (1, 2, 3):
        b = np.asarray(jax.jit(lambda *xs, _l=level: graph(*xs, _l))(
            iq, jnp.int32(m0), *tabs0))
        err = float(np.max(np.abs(a - b)))
        print(json.dumps({"level": level, "max_abs_err": err,
                          "rel": err / scale}), flush=True)
        if level == 1:
            assert err == 0.0, err

    for name, level in (("f32-regroup", 0), ("bf16-regroup", 1),
                        ("bf16-weights", 2), ("bf16-blend", 3)):
        fn = jax.jit(lambda iqv, carry, m, s, r, bi, _l=level:
                     carry + jnp.sum(graph(iqv, m, s, r, bi, _l) * 1e-9))

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
