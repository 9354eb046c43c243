"""Round-3: attribute the carrier-scan sweep's 2.0 s warm cost on TPU.

Prefixes (all jitted once, chained-carry fence):
  channelize   FFT + K band slices + batched ifft + envelope
  autocorr     + per-channel linear autocorrelation
  bandstat     + band slice, median, MAD
  refresh      + estimate_refresh (argmax + octave descent + refine grid)
  full         + comb mass reads (production _comb_contrast)
Suspect: estimate_refresh's refine_period evaluates a ±half/0.125-step
candidate grid (~19k candidates × 5 harmonics of interpolated gathers) per
channel — sub-mHz machinery the scan's detection does not need.
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
    from tempest_tpu.ops.autocorr import (
        _widen_peaks,
        autocorrelation,
        estimate_refresh,
    )
    from tempest_tpu.ops.scan import (
        _channel_geometry,
        _channelize_complex,
        _comb_contrast,
        scan_centers,
    )

    fs_wide = 32e6
    n_wide = 9600000
    rng = np.random.default_rng(0)
    wide = (0.1 * (rng.standard_normal(n_wide)
                   + 1j * rng.standard_normal(n_wide))).astype(np.complex64)
    words = jnp.asarray(wide.view(np.float32))
    centers = scan_centers(fs_wide, 2e6, guard_hz=2e6)
    _, _, fs_chan = _channel_geometry(n_wide, fs_wide, 4e6)
    rate_min, rate_max, corr_seconds = 50.0, 90.0, 0.1
    print(json.dumps({"K": len(centers), "fs_chan": fs_chan}), flush=True)

    def build(stage):
        def fn(w, carry):
            chans, _ = _channelize_complex(w, fs_wide, centers, 4e6)

            def per_chan(ch):
                env = jnp.real(ch) ** 2 + jnp.imag(ch) ** 2
                if stage == "channelize":
                    return jnp.sum(env * 1e-9)
                env0 = env - jnp.mean(env)
                lin, _ = autocorrelation(env0, fs_chan, 0.0, corr_seconds,
                                         scale="linear")
                if stage == "autocorr":
                    return jnp.sum(lin * 1e-9)
                n = lin.shape[0]
                linw = _widen_peaks(lin)
                pos_lo = min(int(round(fs_chan / rate_max)), n - 1)
                pos_hi = min(int(round(fs_chan / rate_min)), n - 1)
                band = linw[pos_lo: pos_hi + 1]
                med = jnp.median(band)
                mad = jnp.median(jnp.abs(band - med))
                if stage == "bandstat":
                    return med + mad
                fv = estimate_refresh(lin, fs_chan, rate_min, rate_max,
                                      scale="linear")
                if stage == "refresh":
                    return fv * 1e-9 + med + mad
                mass, prom, fv = _comb_contrast(env, fs_chan, corr_seconds,
                                                rate_min, rate_max)
                return mass * 1e-9 + prom * 1e-9 + fv * 1e-9

            return carry + jnp.sum(jax.vmap(per_chan)(chans))

        return jax.jit(fn)

    for stage in ("channelize", "autocorr", "bandstat", "refresh", "full"):
        fn = build(stage)

        def run():
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(4):
                c = fn(words, c)
            _ = float(c)
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        run()
        best = min(run(), run()) / 4 * 1e3
        print(json.dumps({"stage": stage, "ms_per_sweep": round(best, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
