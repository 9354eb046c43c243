"""Round-3 probe: fuse the chunk-select's shift axis into ONE einsum.

The select stage applies the (F, G_o, R) bf16 one-hot once per window-chunk
offset (n_chunks_per_win = 4 einsums at 1080p60/20Msps) — the MXU streams
the ~240 MB operand four times, and attribution puts the stage at 2.1 ms of
the 6.2 ms block.  Stacking the four shifted row views into (F, R, C, 128)
and contracting once ("fgr,frck->fgck") reads the one-hot ONCE for the same
FLOPs; the output layout (c major, k minor) is exactly the concat the
baseline builds.  The stacked rows cost one extra materialisation of the
signal (~96 MB bf16 at 36f) — a 4x-to-1.4x traffic trade.

Also measures the agenda's two-level select (factor r = hi*L + lo, one-hots
(F,G_o,L)+(F,G_o,R_hi)): the level-1 intermediate is (F,G_o,R_hi,128) — as
large as the one-hot it replaces — so it is expected to lose; measured to
close the question.

Variants (all full StreamingExactPlan graphs, do_align off, 36f, judged
config, chained-carry protocol as exp_r3_attrib):
  base        current concat-of-C einsums
  fused       one einsum over stacked shifts
  two-level   hi/lo factored select (L=512), fused shifts
Prefix timings (select stage only) for base/fused attribute the delta.
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
    C = plan.n_chunks_per_win
    R = plan.R
    print(json.dumps({"R": R, "per_o": plan.per_o, "per_p": plan.per_p,
                      "C": C, "win_w": plan.win_w, "span_w": plan.span_w}),
          flush=True)

    def cut(iqv, m):
        env = demodulate(iqv, cfg)
        env_m = jax.lax.dynamic_slice(env, (m,), (plan.L0,))
        env_m = jnp.concatenate([
            env_m, jnp.broadcast_to(env_m[-1],
                                    (plan.pad_len - plan.frame_len,))])
        frames_sig = jnp.stack([
            jax.lax.slice(env_m, (int(u),), (int(u) + plan.pad_len,))
            for u in plan.u])
        return frames_sig.reshape(F, -1, 128).astype(jnp.bfloat16)

    def select_base(rows128, sel_src):
        sel = (sel_src[..., None] == jnp.arange(R, dtype=jnp.int32)
               ).astype(jnp.bfloat16)
        return jnp.concatenate(
            [jnp.einsum("fgr,frk->fgk", sel, rows128[:, i: R + i],
                        preferred_element_type=jnp.float32)
             for i in range(C)], axis=2,
        ).reshape(F, 128, plan.per_o, plan.win_w)

    def select_fused(rows128, sel_src):
        sel = (sel_src[..., None] == jnp.arange(R, dtype=jnp.int32)
               ).astype(jnp.bfloat16)
        rows_sh = jnp.stack([rows128[:, i: R + i] for i in range(C)], axis=2)
        return jnp.einsum("fgr,frck->fgck", sel, rows_sh,
                          preferred_element_type=jnp.float32,
                          ).reshape(F, 128, plan.per_o, plan.win_w)

    L = 512  # lo block; R_hi = ceil(R / L)
    R_hi = -(-R // L)

    def select_twolevel(rows128, sel_src):
        lo = jnp.where(sel_src >= 0, sel_src % L, -1)
        hi = jnp.where(sel_src >= 0, sel_src // L, -1)
        A = (lo[..., None] == jnp.arange(L, dtype=jnp.int32)
             ).astype(jnp.bfloat16)                       # (F, G_o, L)
        B = (hi[..., None] == jnp.arange(R_hi, dtype=jnp.int32)
             ).astype(jnp.float32)                        # (F, G_o, R_hi)
        pad = max(R_hi * L + C - rows128.shape[1], 0)
        rows_p = jnp.concatenate(
            [rows128, jnp.zeros((F, pad, 128), rows128.dtype)], axis=1
        )[:, : R_hi * L + C]
        rows_sh = jnp.stack(
            [rows_p[:, i: R_hi * L + i] for i in range(C)], axis=2
        ).reshape(F, R_hi, L, C, 128)
        U = jnp.einsum("fgl,fhlck->fghck", A, rows_sh,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("fgh,fghck->fgck", B, U,
                          preferred_element_type=jnp.float32,
                          ).reshape(F, 128, plan.per_o, plan.win_w)

    def tail(S, reg_src, blend_idx):
        aligned = jnp.concatenate(
            [jax.lax.slice(S, (0, o, 0, o),
                           (F, o + 1, plan.per_o, o + plan.span_w))
             for o in range(128)], axis=1,
        ).reshape(F, 128 * plan.per_o, plan.span_w)
        reg = (reg_src[..., None] == jnp.arange(
            128 * plan.per_o, dtype=jnp.int32)).astype(jnp.float32)
        regrouped = jnp.einsum(
            "fgk,fkw->fgw", reg, aligned,
            preferred_element_type=jnp.float32,
        ).reshape(F, P, plan.per_p, plan.span_w)
        z = jnp.einsum("fpbs,psw->fpbw", regrouped, jnp.asarray(plan.weights),
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

    SELECTS = {"base": select_base, "fused": select_fused,
               "twolevel": select_twolevel}

    def build(select_name, prefix_only):
        sel_fn = SELECTS[select_name]

        def fn(iqv, carry, m, sel_src, reg_src, blend_idx):
            rows128 = cut(iqv, m)
            S = sel_fn(rows128, sel_src)
            out = S if prefix_only else tail(S, reg_src, blend_idx)
            return carry + jnp.sum(out.astype(jnp.float32) * 1e-9)

        return jax.jit(fn)

    iters = int(os.environ.get("TT_EXP_ITERS", 24))
    phases = [(-i * n) % spf for i in range(iters)]
    dev_tables: dict[int, tuple] = {}

    def tabs_for(p):
        k, m = plan.bin_for_phase(p)
        if k not in dev_tables:
            dev_tables[k] = tuple(jnp.asarray(t) for t in plan.tables(k))
        return m, dev_tables[k]

    # Numerical equivalence of the select variants (same reductions).
    m0, tabs0 = tabs_for(phases[1])
    rows = jax.jit(cut)(iq, jnp.int32(m0))
    Sb = np.asarray(jax.jit(select_base)(rows, tabs0[0]))
    for name in ("fused", "twolevel"):
        Sv = np.asarray(jax.jit(SELECTS[name])(rows, tabs0[0]))
        err = float(np.max(np.abs(Sv - Sb)))
        print(json.dumps({"equiv": name, "max_abs_err": err}), flush=True)
        assert err < 1e-3, (name, err)

    for prefix_only in (True, False):
        for name in SELECTS:
            if prefix_only and name == "twolevel":
                pass  # measure its prefix too — the intermediate is the story
            fn = build(name, prefix_only)

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
            msps = n / (best / 1e3) / 1e6
            print(json.dumps({
                "variant": name,
                "scope": "select-prefix" if prefix_only else "full",
                "ms_per_block": round(best, 2),
                "msps": round(msps, 1),
                "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
