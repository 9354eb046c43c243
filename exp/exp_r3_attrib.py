"""Round-3 attribution: where do the 6.18 ms of a 36f fidelity block go?

Builds truncated variants of the StreamingExactPlan graph (demod → shift →
cut → select → align → regroup → weights → blend → ema) and times each
prefix with the chained-readback protocol.  Differences between successive
prefixes attribute the stages.  All shapes identical to the production
program; truncated outputs are reduced to a (1,8) slice so XLA cannot dead-
code the prefix (the reduction forces every element).
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
        cfg.render_size, 64, 64)
    n = cfg.block_samples
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    P = plan.num_phases

    def build(stage):
        def fn(iq, carry, m, sel_src, reg_src, blend_idx):
            env = demodulate(iq, cfg)
            if stage == "demod":
                out = env
            else:
                env_m = jax.lax.dynamic_slice(env, (m,), (plan.L0,))
                env_m = jnp.concatenate([
                    env_m, jnp.broadcast_to(
                        env_m[-1], (plan.pad_len - plan.frame_len,))])
                frames_sig = jnp.stack([
                    jax.lax.slice(env_m, (int(u),), (int(u) + plan.pad_len,))
                    for u in plan.u])
                rows128 = frames_sig.reshape(F, -1, 128).astype(jnp.bfloat16)
                if stage == "cut":
                    out = rows128.astype(jnp.float32)
                else:
                    sel = (sel_src[..., None] == jnp.arange(
                        plan.R, dtype=jnp.int32)).astype(jnp.bfloat16)
                    S = jnp.concatenate(
                        [jnp.einsum("fgr,frk->fgk", sel,
                                    rows128[:, i: plan.R + i],
                                    preferred_element_type=jnp.float32)
                         for i in range(plan.n_chunks_per_win)], axis=2,
                    ).reshape(F, 128, plan.per_o, plan.win_w)
                    if stage == "select":
                        out = S
                    else:
                        aligned = jnp.concatenate(
                            [jax.lax.slice(S, (0, o, 0, o),
                                           (F, o + 1, plan.per_o,
                                            o + plan.span_w))
                             for o in range(128)], axis=1,
                        ).reshape(F, 128 * plan.per_o, plan.span_w)
                        if stage == "align":
                            out = aligned
                        else:
                            reg = (reg_src[..., None] == jnp.arange(
                                128 * plan.per_o, dtype=jnp.int32)
                            ).astype(jnp.float32)
                            regrouped = jnp.einsum(
                                "fgk,fkw->fgw", reg, aligned,
                                preferred_element_type=jnp.float32,
                            ).reshape(F, P, plan.per_p, plan.span_w)
                            if stage == "regroup":
                                out = regrouped
                            else:
                                z = jnp.einsum(
                                    "fpbs,psw->fpbw", regrouped,
                                    jnp.asarray(plan.weights),
                                    preferred_element_type=jnp.float32)
                                if stage == "weights":
                                    out = z
                                else:
                                    G_p = P * plan.per_p
                                    blend = (
                                        jnp.asarray(plan.coeff, jnp.float32)[None, :, None]
                                        * (blend_idx[..., None] == jnp.arange(
                                            G_p, dtype=jnp.int32)).astype(jnp.float32)
                                    ).reshape(F, plan.h_out, 2, G_p).sum(axis=2)
                                    out = jnp.einsum(
                                        "fhg,fgw->fhw", blend,
                                        z.reshape(F, G_p, plan.w_out),
                                        preferred_element_type=jnp.float32)
            # Chain carry: a full reduction of the stage output (forces every
            # element) added to the carried scalar.
            return carry + jnp.sum(out.astype(jnp.float32) * 1e-9)

        return jax.jit(fn)

    stages = ["demod", "cut", "select", "align", "regroup", "weights", "blend"]
    iters = 24
    phases = [(-i * n) % spf for i in range(iters)]
    dev_tables: dict[int, tuple] = {}

    def tabs_for(p):
        k, m = plan.bin_for_phase(p)
        if k not in dev_tables:
            dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
        return m, dev_tables[k]

    results = {}
    prev = 0.0
    for stage in stages:
        fn = build(stage)

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
        results[stage] = best
        print(json.dumps({"stage": stage, "ms_per_block": round(best, 2),
                          "delta_ms": round(best - prev, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        prev = best
    print(json.dumps({"attribution_ms": {k: round(v, 2)
                                         for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
