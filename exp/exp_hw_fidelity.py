"""On-hardware fidelity check (TPU): auto_reconstruct on the judged synthetic
1080p60 / 20 Msps / 18 dB capture, integer-roll vs sub-pixel registration.

Appends JSON lines to exp_r2_results.jsonl.
Usage: timeout 3000 python exp_hw_fidelity.py > exp_hw_fidelity.log 2>&1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

RESULTS = "exp_r2_results.jsonl"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(row):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"RESULT {row}")


def main():
    import dataclasses

    import jax.numpy as jnp

    import tempest_tpu as tt
    from tempest_tpu.ops.resample import downgrade_image
    from tempest_tpu.pipeline.offline import (
        ReconstructionConfig,
        estimate_timing,
        reconstruct_frames,
    )
    from tempest_tpu.render.screen import aligned_psnr

    mode = tt.ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    fs = 20e6
    cap = tt.generate_iq(mode, fs, int(fs * 0.25), snr_db=18.0, seed=33)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))

    timing = estimate_timing(cap.iq, fs)
    record({"hw_fidelity": "timing", "mode": timing.mode_name,
            "fv": round(timing.refresh_hz, 6)})
    base = ReconstructionConfig(
        sample_rate=fs, mode=timing.mode, n_frames=14)
    for name, kw in (
        ("int_roll", {}),
        ("subpixel", {"align_subpixel": True}),
        ("int_roll_f32mxu", {"resampler": "mxu"}),
        ("exact_cuts", {"resampler": "mxu3", "subsample_align": True,
                        "do_align": False}),
    ):
        cfg = dataclasses.replace(base, **kw)
        t0 = time.perf_counter()
        recon = reconstruct_frames(cap.iq, cfg, alpha=0.5)
        wall = time.perf_counter() - t0
        db, _ = aligned_psnr(truth, recon.image)
        fracs = np.abs(recon.sync - np.round(recon.sync)).mean()
        record({
            "hw_fidelity": name, "psnr_db": round(float(db), 4),
            "sync_dtype": str(recon.sync.dtype),
            "mean_frac": round(float(fracs), 4),
            "wall_s": round(wall, 1),
        })


if __name__ == "__main__":
    main()
