"""Round-4 on-hardware quality check: sub-pixel registration via matmul
shift operators must match the roll formulation's PSNR (13.94 dB on the
judged 1080p60 / 20 Msps / 18 dB synthetic — docs/performance.md).

The matmul rides bf16 MXU passes at DEFAULT precision (measured final-EMA
max rel diff vs rolls 0.65% on random signal, exp_r4_subpixel.py); this
pins that the difference is invisible at the reconstruction's own error
floor.  Usage: timeout 3000 python exp_r4_subpix_psnr.py > log 2>&1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import tempest_tpu as tt
    from tempest_tpu.ops.resample import downgrade_image
    from tempest_tpu.pipeline.offline import (ReconstructionConfig,
                                              estimate_timing,
                                              reconstruct_frames)
    from tempest_tpu.render.screen import aligned_psnr

    mode = tt.ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    fs = 20e6
    cap = tt.generate_iq(mode, fs, int(fs * 0.25), snr_db=18.0, seed=33)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    timing = estimate_timing(cap.iq, fs)
    print(json.dumps({"mode": timing.mode_name,
                      "fv": round(timing.refresh_hz, 6)}), flush=True)
    base = ReconstructionConfig(sample_rate=fs, mode=timing.mode, n_frames=14)
    for name, kw in (
        ("subpixel_roll", {"align_subpixel": True, "align_impl": "roll"}),
        ("subpixel_matmul", {"align_subpixel": True, "align_impl": "matmul"}),
    ):
        cfg = dataclasses.replace(base, **kw)
        t0 = time.perf_counter()
        recon = reconstruct_frames(cap.iq, cfg, alpha=0.8)
        img = np.asarray(recon.image)
        psnr, shift = aligned_psnr(truth, img)
        print(json.dumps({"variant": name, "psnr_db": round(psnr, 3),
                          "shift": list(shift),
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
