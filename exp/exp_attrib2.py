"""Resample-stage ladder (TPU): cumulative timing of mxu3's internal stages
to locate the residual cost (suspect: the 128-step align slice stack).

Each rung is a standalone jitted program over 12 frames with chained carry +
one fence; appends JSON to exp_r2_results.jsonl.

Usage: timeout 3000 python exp_attrib2.py > exp_attrib2.log 2>&1
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

    from tempest_tpu.ops import resample as rs

    F = 12
    y_t, x_t = 1125, 2200
    frame_len = 333333
    h_out, w_out = 600, 800
    num_phases = 64
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.random((F, frame_len)).astype(np.float32))

    # Rebuild mxu3's host tables once (mirrors frame_to_screen_mxu3).
    start, frac, wr, cols, _ = rs._screen_geometry(
        frame_len, y_t, x_t, (h_out, w_out))
    span = int(np.ceil(cols[-1] + 1)) + 2
    span_w = -(-span // 128) * 128
    win_w = span_w + 128
    ncw = win_w // 128
    raw = start.reshape(-1)
    fs_ = np.maximum(raw, 0)
    fr_ = np.clip(frac.reshape(-1) + (raw - fs_), 0.0, 1.0 - 1e-9)
    phase = np.minimum((fr_ * num_phases).astype(np.int64), num_phases - 1)
    n_lines = 2 * h_out
    chunk = fs_ // 128
    off = fs_ % 128
    R = int(chunk.max()) + 1

    def pack(keys, n_keys):
        slot = np.zeros(n_lines, np.int64)
        counts = np.zeros(n_keys, np.int64)
        for e in np.argsort(keys, kind="stable"):
            slot[e] = counts[keys[e]]
            counts[keys[e]] += 1
        return slot, int(counts.max())

    slot_o, per_o = pack(off, 128)
    slot_p, per_p = pack(phase, num_phases)
    sel = np.zeros((128 * per_o, R), np.float32)
    sel[off * per_o + slot_o, chunk] = 1.0
    reg = np.zeros((num_phases * per_p, 128 * per_o), np.float32)
    reg[phase * per_p + slot_p, off * per_o + slot_o] = 1.0
    blend = np.zeros((h_out, num_phases * per_p), np.float32)
    rows = np.repeat(np.arange(h_out), 2)
    coeff = np.stack([1.0 - wr[:, 0], wr[:, 0]], axis=1).reshape(-1)
    blend[rows, phase * per_p + slot_p] += coeff
    weights = np.zeros((num_phases, span_w, w_out), np.float32)
    for p in range(num_phases):
        fp = (p + 0.5) / num_phases
        pos = fp + cols
        i0 = pos.astype(np.int64)
        frx = (pos - i0).astype(np.float32)
        np.add.at(weights[p], (i0, np.arange(w_out)), 1.0 - frx)
        np.add.at(weights[p], (i0 + 1, np.arange(w_out)), frx)
    sel_b = jnp.asarray(sel, jnp.bfloat16)
    reg_j = jnp.asarray(reg)
    blend_j = jnp.asarray(blend)
    weights_j = jnp.asarray(weights)
    pad_len = 128 * (R + ncw)

    def windows(sig):
        sig_pad = jnp.concatenate(
            [sig, jnp.broadcast_to(sig[-1], (pad_len - frame_len,))])
        rows128 = sig_pad.reshape(-1, 128)
        return jnp.concatenate(
            [rows128[i : R + i] for i in range(ncw)], axis=1)

    def select(sig):
        return jnp.dot(sel_b, windows(sig).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32
                       ).reshape(128, per_o, win_w)

    def align(S):
        return jnp.concatenate(
            [jax.lax.slice(S, (o, 0, o), (o + 1, per_o, o + span_w))
             for o in range(128)], axis=0).reshape(128 * per_o, span_w)

    def regroup(a):
        return jnp.dot(reg_j, a, preferred_element_type=jnp.float32
                       ).reshape(num_phases, per_p, span_w)

    def weight(rg):
        return jnp.einsum("pbs,psw->pbw", rg, weights_j,
                          preferred_element_type=jnp.float32)

    def blend_out(z):
        return jnp.dot(blend_j, z.reshape(num_phases * per_p, w_out),
                       preferred_element_type=jnp.float32)

    ladders = {
        "r_windows": lambda s: windows(s),
        "r_select": lambda s: select(s),
        "r_align": lambda s: align(select(s)),
        "r_regroup": lambda s: regroup(align(select(s))),
        "r_weight": lambda s: weight(regroup(align(select(s)))),
        "r_full": lambda s: blend_out(weight(regroup(align(select(s))))),
    }
    for name, fn in ladders.items():
        @jax.jit
        def step(x, c, fn=fn):
            out = jax.vmap(lambda s: fn(s + c))(x)
            return out, out.ravel()[0] * 0.0

        try:
            bench(name, step, frames)
        except Exception as e:  # noqa: BLE001
            record({"stage": name, "error": f"{type(e).__name__}: {e}"[:300]})


if __name__ == "__main__":
    main()
