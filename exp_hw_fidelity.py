"""On-hardware fidelity check (TPU): auto_reconstruct on the judged synthetic
1080p60 / 20 Msps / 18 dB capture, integer-roll vs sub-pixel registration.

Appends JSON lines to exp_r2_results.jsonl.
Usage: timeout 3000 python exp_hw_fidelity.py > exp_hw_fidelity.log 2>&1
"""

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
    import jax.numpy as jnp

    import tempest_tpu as tt
    from tempest_tpu.ops.resample import downgrade_image
    from tempest_tpu.pipeline.offline import auto_reconstruct
    from tempest_tpu.render.screen import aligned_psnr

    mode = tt.ALL_VIDEO_MODES["1920x1080 @ 60Hz"]
    fs = 20e6
    cap = tt.generate_iq(mode, fs, int(fs * 0.25), snr_db=18.0, seed=33)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))

    for name, kw in (("int_roll", {}), ("subpixel", {"align_subpixel": True})):
        t0 = time.perf_counter()
        timing, recon = auto_reconstruct(cap.iq, fs, alpha=0.5, **kw)
        wall = time.perf_counter() - t0
        db, _ = aligned_psnr(truth, recon.image)
        record({
            "hw_fidelity": name, "mode": timing.mode_name,
            "fv": round(timing.refresh_hz, 5), "psnr_db": round(db, 2),
            "wall_s": round(wall, 1),
        })


if __name__ == "__main__":
    main()
