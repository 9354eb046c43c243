"""Formulation shoot-out for the two stages the attribution run flagged
(TPU): the int16 I/Q de-interleave (strided minor-axis access) and the EMA
fold reduction.  Appends JSON lines to exp_r2_results.jsonl.

Usage: timeout 3000 python exp_demod.py [variant ...] > exp_demod.log 2>&1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

RESULTS = "exp_r2_results.jsonl"
N = 4_000_008 // 8 * 8  # complex samples (multiple of 64 for the reshapes)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(row):
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"RESULT {row}")


def bench(name, step, x0, iters=24):
    import jax.numpy as jnp

    c0 = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    out, c = step(x0, c0)
    _ = np.asarray(out.ravel()[:8])
    compile_s = time.perf_counter() - t0

    def timed(k):
        c = c0
        t0 = time.perf_counter()
        for _ in range(k):
            out, c = step(x0, c)
        _ = np.asarray(out.ravel()[:8])
        return time.perf_counter() - t0

    timed(2)
    dt = timed(iters)
    record({"stage": name, "ms_per_call": round(dt / iters * 1e3, 3),
            "compile_s": round(compile_s, 1)})


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    words = jax.device_put(
        rng.integers(-16384, 16384, 2 * N, dtype=np.int16))
    h, w = 600, 800
    screens = jax.device_put(rng.random((12, h, w)).astype(np.float32))
    ema0 = jax.device_put(rng.random((h, w)).astype(np.float32))

    # Pair-sum matrix: (128 words) -> (64 samples).
    P = np.zeros((128, 64), np.float32)
    P[np.arange(128), np.arange(128) // 2] = 1.0
    Pj = jnp.asarray(P)

    def carry(e):
        return e.ravel()[0] * 0.0

    variants = {}

    # --- demod formulations -------------------------------------------------
    @jax.jit
    def d_current(x, c):
        ri = x.reshape(-1, 2).astype(jnp.float32)
        e = jnp.sqrt(ri[:, 0] ** 2 + ri[:, 1] ** 2) + c
        return e, carry(e)

    variants["d_current"] = (d_current, words)

    @jax.jit
    def d_pairsum_matmul(x, c):
        sq = x.astype(jnp.float32) ** 2
        e2 = jnp.dot(sq.reshape(-1, 128), Pj,
                     preferred_element_type=jnp.float32)
        e = jnp.sqrt(e2).reshape(-1) + c
        return e, carry(e)

    variants["d_pairsum_matmul"] = (d_pairsum_matmul, words)

    @jax.jit
    def d_conv2(x, c):
        sq = (x.astype(jnp.float32) ** 2)[None, None, :]
        k = jnp.ones((1, 1, 2), jnp.float32)
        e2 = jax.lax.conv_general_dilated(sq, k, window_strides=(2,),
                                          padding="VALID")[0, 0]
        e = jnp.sqrt(e2) + c
        return e, carry(e)

    variants["d_conv2"] = (d_conv2, words)

    @jax.jit
    def d_sum_minor(x, c):
        sq = x.astype(jnp.float32) ** 2
        e = jnp.sqrt(sq.reshape(-1, 2).sum(axis=1)) + c
        return e, carry(e)

    variants["d_sum_minor"] = (d_sum_minor, words)

    @jax.jit
    def d_rowslice(x, c):
        sq = x.astype(jnp.float32) ** 2
        rows = sq.reshape(-1, 256)
        e2 = rows[:, 0::2] + rows[:, 1::2]
        e = jnp.sqrt(e2).reshape(-1) + c
        return e, carry(e)

    variants["d_rowslice"] = (d_rowslice, words)

    # --- EMA fold formulations ---------------------------------------------
    alpha = jnp.float32(0.1)

    def wvec(n):
        k = jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
        return (1.0 - alpha) * alpha ** k

    @jax.jit
    def e_einsum(fr, c):
        out = alpha ** 12 * ema0 + jnp.einsum(
            "f,fhw->hw", wvec(12), fr + c,
            preferred_element_type=jnp.float32)
        return out, carry(out)

    variants["e_einsum"] = (e_einsum, screens)

    @jax.jit
    def e_matvec(fr, c):
        flat = (fr + c).reshape(12, -1)
        out = alpha ** 12 * ema0 + jnp.dot(
            wvec(12)[None, :], flat,
            preferred_element_type=jnp.float32).reshape(h, w)
        return out, carry(out)

    variants["e_matvec"] = (e_matvec, screens)

    @jax.jit
    def e_mulsum(fr, c):
        out = alpha ** 12 * ema0 + (wvec(12)[:, None, None] * (fr + c)).sum(0)
        return out, carry(out)

    variants["e_mulsum"] = (e_mulsum, screens)

    names = sys.argv[1:] or list(variants)
    for name in names:
        step, x0 = variants[name]
        try:
            bench(name, step, x0)
        except Exception as e:  # noqa: BLE001
            record({"stage": name, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
