"""Demod shoot-out round 2 (TPU): isolate int16 conversion cost vs strided
de-interleave cost, and try a host-planar (2, N) layout.

Usage: timeout 3000 python exp_demod2.py > exp_demod2.log 2>&1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

RESULTS = "exp_r2_results.jsonl"
N = 1 << 22  # complex samples


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
    w_host = rng.integers(-16384, 16384, 2 * N, dtype=np.int16)
    words = jax.device_put(w_host)
    planar = jax.device_put(np.ascontiguousarray(w_host.reshape(-1, 2).T))
    words_f32 = jax.device_put(w_host.astype(np.float32))

    P = np.zeros((128, 64), np.float32)
    P[np.arange(128), np.arange(128) // 2] = 1.0
    Pj = jnp.asarray(P)

    def carry(e):
        return e.ravel()[0] * 0.0

    variants = {}

    @jax.jit
    def d_square_only(x, c):
        e = x.astype(jnp.float32) ** 2 + c
        return e, carry(e)

    variants["d_square_only"] = (d_square_only, words)

    @jax.jit
    def d_square_f32in(x, c):
        e = x * x + c
        return e, carry(e)

    variants["d_square_f32in"] = (d_square_f32in, words_f32)

    @jax.jit
    def d_planar(x, c):
        xf = x.astype(jnp.float32)
        e = jnp.sqrt(xf[0] ** 2 + xf[1] ** 2) + c
        return e, carry(e)

    variants["d_planar"] = (d_planar, planar)

    @jax.jit
    def d_pairsum_matmul(x, c):
        sq = x.astype(jnp.float32) ** 2
        e2 = jnp.dot(sq.reshape(-1, 128), Pj,
                     preferred_element_type=jnp.float32)
        e = jnp.sqrt(e2).reshape(-1) + c
        return e, carry(e)

    variants["d_pairsum_matmul"] = (d_pairsum_matmul, words)

    @jax.jit
    def d_rowslice(x, c):
        sq = x.astype(jnp.float32) ** 2
        rows = sq.reshape(-1, 256)
        e2 = rows[:, 0::2] + rows[:, 1::2]
        e = jnp.sqrt(e2).reshape(-1) + c
        return e, carry(e)

    variants["d_rowslice"] = (d_rowslice, words)

    @jax.jit
    def d_conv2_n(x, c):
        sq = (x.astype(jnp.float32) ** 2)[None, None, :]
        k = jnp.ones((1, 1, 2), jnp.float32)
        e2 = jax.lax.conv_general_dilated(sq, k, window_strides=(2,),
                                          padding="VALID")[0, 0]
        e = jnp.sqrt(e2) + c
        return e, carry(e)

    variants["d_conv2_n"] = (d_conv2_n, words)

    names = sys.argv[1:] or list(variants)
    for name in names:
        step, x0 = variants[name]
        try:
            bench(name, step, x0)
        except Exception as e:  # noqa: BLE001
            record({"stage": name, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
