"""Round-3: carrier-scan throughput on the real TPU.

One batched program channelises a wideband capture (2^23-sample FFT) into K
candidate channels and scores each with the refresh-comb metric.  Measures
the warm per-sweep latency (chained-carry fence: the scores feed a summed
carry, one scalar readback fences the loop) and MHz of band scanned per
second.  Also sanity-checks the detection on a synthetic emission placed
off-center.
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

    import tempest_tpu as tt
    from tempest_tpu.ops.scan import scan_band, scan_centers

    mode = tt.ALL_VIDEO_MODES["1024x768 @ 60Hz"]
    fs_base, fs_wide = 4e6, 32e6
    n_base = int(fs_base * 0.3)
    cap = tt.generate_iq(mode, fs_base, n_base, snr_db=25.0, seed=5)
    x = np.asarray(cap.iq, np.complex64)

    r = int(fs_wide / fs_base)
    X = np.fft.fft(x)
    n = len(x)
    nw = n * r
    Y = np.zeros(nw, np.complex128)
    Y[: n // 2] = X[: n // 2]
    Y[nw - n // 2 :] = X[n // 2 :]
    y = np.fft.ifft(Y) * r
    t = np.arange(nw) / fs_wide
    wide = (y * np.exp(2j * np.pi * 9e6 * t)).astype(np.complex64)
    rng = np.random.default_rng(0)
    wide += (0.05 * (rng.standard_normal(nw)
                     + 1j * rng.standard_normal(nw))).astype(np.complex64)

    centers = scan_centers(fs_wide, 2e6, guard_hz=2e6)
    print(json.dumps({"n_wide": nw, "K": len(centers)}), flush=True)

    t0 = time.perf_counter()
    res = scan_band(wide, fs_wide, centers, chan_bw=4e6, corr_seconds=0.1)
    compile_s = time.perf_counter() - t0
    best = res.best()
    print(json.dumps({"best_offset_mhz": best[0] / 1e6,
                      "best_fv": round(best[2], 3),
                      "prom_best": round(float(
                          res.prominence_db[res.ranking()[0]]), 1),
                      "prom_floor": round(float(np.median(
                          res.prominence_db)), 1),
                      "compile_s": round(compile_s, 1)}), flush=True)

    # Warm repeat timing (host->device upload + sweep + readback).
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        scan_band(wide, fs_wide, centers, chan_bw=4e6, corr_seconds=0.1)
        times.append(time.perf_counter() - t0)
    warm = min(times)
    print(json.dumps({
        "warm_s": round(warm, 3),
        "band_mhz_per_s": round(fs_wide / 1e6 / warm, 1),
        "samples_per_s_msps": round(nw / warm / 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
