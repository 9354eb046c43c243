"""Round-3 experiment: the quantised-tables chain WITH the sync stage on.

exp_r3_fidelity measured the tables formulation (on-device broadcast-compare
one-hots from small int32 inputs, one dynamic re-base + static cuts) at
6.18 ms per 36f block WITHOUT sync — 3 ms under the offline mxu3 chain's
9.16 ms with sync (~1.2 ms of which is sync).  Hypothesis: generating the
select/regroup/blend one-hots on the fly from tiny tables is cheaper than
streaming the baked one-hot constants from HBM.  If the sync-on tables chain
lands ≤8 ms/36f, it becomes the new headline full-chain program
(VERDICT #2's Done criterion: ≥1500 Msps with sync on).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(name, cfg, iters=24):
    import jax
    import jax.numpy as jnp

    from tempest_tpu.pipeline.offline import make_reconstruct_fn

    step = make_reconstruct_fn(cfg)
    n = cfg.block_samples
    spf = cfg.samples_per_frame
    rng = np.random.default_rng(0)
    iq = jax.device_put(rng.integers(-16384, 16384, 2 * n, dtype=np.int16))
    ema = jnp.zeros(cfg.render_size, jnp.float32)
    alpha = jnp.float32(0.1)
    carry = cfg.carry_phase
    phases = [(-i * n) % spf for i in range(iters)]

    def call(e, p):
        return step(iq, e, alpha, p) if carry else step(iq, e, alpha)

    t0 = time.perf_counter()
    e, *_ = call(ema, phases[0])
    _ = np.asarray(e[:1, :8])
    t_compile = time.perf_counter() - t0

    def timed(ps):
        e = ema
        t0 = time.perf_counter()
        for p in ps:
            e, frames, sync, score = call(e, p)
        _ = np.asarray(e[:1, :8])
        return time.perf_counter() - t0

    timed(phases[:2])
    t1 = timed(phases)
    t2 = timed(phases)
    best = min(t1, t2)
    rec = {
        "case": name,
        "n_frames": cfg.n_frames,
        "compile_s": round(t_compile, 1),
        "ms_per_block": round(best / iters * 1e3, 2),
        "msps": round(n * iters / best / 1e6, 1),
        "rt": round(n * iters / best / 1e6 / 20.0, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    from tempest_tpu.pipeline.offline import ReconstructionConfig
    from tempest_tpu.video.modes import ALL_VIDEO_MODES

    mode = ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    fs = 20e6
    base = dict(sample_rate=fs, mode=mode, input_format="iq_interleaved")
    tables = dict(carry_phase=True, subsample_align=True, resampler="mxu3",
                  phase_bins=64)
    cases = [
        # tables chain + integer sync (the headline semantics)
        ("tables+sync 36f", ReconstructionConfig(
            **base, n_frames=36, **tables, do_align=True)),
        # tables chain + sub-pixel sync (highest-quality mode, full speed?)
        ("tables+subpixel 36f", ReconstructionConfig(
            **base, n_frames=36, **tables, do_align=True,
            align_subpixel=True)),
        # current offline headline for a same-session baseline
        ("offline mxu3+sync 36f", ReconstructionConfig(
            **base, n_frames=36)),
        # taps=4 speed check at identical shapes (fidelity chain)
        ("tables fidelity taps4 36f", ReconstructionConfig(
            **base, n_frames=36, **tables, do_align=False, interp_taps=4)),
    ]
    out = [run_case(n, c) for n, c in cases]
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
