"""Round-3 probe: keep the select output S (and the cut) in bf16.

Every element of S is a single envelope sample that already passed the bf16
select cast (bf16 × 1.0 accumulated f32), so emitting the select einsum in
bf16 is LOSSLESS — and S (F, 128, per_o, win_w) f32 is ~245 MB at 36f, plus
the aligned slice-stack's reads.  Likewise the envelope can be cast to bf16
BEFORE the frame-cut slices (rows128 casts it after anyway — identical
values, half the slice/concat traffic).

Ladder (full StreamingExactPlan graph, production form + bf16 weights,
do_align off, 36f judged config):
  base      current: cut f32, S f32 (aligned cast bf16 at regroup)
  s-bf16    select einsum emits bf16 (aligned slices run in bf16)
  cut-bf16  + envelope cast bf16 before the cut slices
Exactness asserted 0.0 for every rung.
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
        cfg.render_size, 64, 64, einsum_bf16=True)
    n = cfg.block_samples
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    P = plan.num_phases

    def graph(iqv, m, sel_src, reg_src, blend_idx, level):
        # level: 0 = production, 1 = S in bf16, 2 = + cut in bf16.
        env = demodulate(iqv, cfg)
        env_m = jax.lax.dynamic_slice(env, (m,), (plan.L0,))
        if level >= 2:
            env_m = env_m.astype(jnp.bfloat16)
        env_m = jnp.concatenate([
            env_m, jnp.broadcast_to(env_m[-1],
                                    (plan.pad_len - plan.frame_len,)
                                    ).astype(env_m.dtype)])
        frames_sig = jnp.stack([
            jax.lax.slice(env_m, (int(u),), (int(u) + plan.pad_len,))
            for u in plan.u])
        rows128 = frames_sig.reshape(F, -1, 128).astype(jnp.bfloat16)
        sel = (sel_src[..., None] == jnp.arange(plan.R, dtype=jnp.int32)
               ).astype(jnp.bfloat16)
        out_dt = jnp.bfloat16 if level >= 1 else jnp.float32
        S = jnp.concatenate(
            [jnp.einsum("fgr,frk->fgk", sel, rows128[:, i: plan.R + i],
                        preferred_element_type=out_dt)
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

    iters = int(os.environ.get("TT_EXP_ITERS", 24))
    phases = [(-i * n) % spf for i in range(iters)]
    dev_tables: dict[int, tuple] = {}

    def tabs_for(p):
        k, m = plan.bin_for_phase(p)
        if k not in dev_tables:
            dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
        return m, dev_tables[k]

    m0, tabs0 = tabs_for(phases[1])
    a = np.asarray(jax.jit(lambda *xs: graph(*xs, 0))(
        iq, jnp.int32(m0), *tabs0))
    for level in (1, 2):
        b = np.asarray(jax.jit(lambda *xs, _l=level: graph(*xs, _l))(
            iq, jnp.int32(m0), *tabs0))
        err = float(np.max(np.abs(a - b)))
        print(json.dumps({"level": level, "max_abs_err": err}), flush=True)
        assert err == 0.0, (level, err)

    for name, level in (("base", 0), ("s-bf16", 1), ("cut-bf16", 2)):
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
