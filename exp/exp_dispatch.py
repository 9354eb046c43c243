"""Measure the per-dispatch floor of this TPU tunnel: a trivial jitted
program chained N times (dependency chain, one readback fence).  If chained
calls cost ~ms each regardless of compute, block sizing / multi-stream
batching is the only lever below that floor."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    @jax.jit
    def tick(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    x = tick(x)
    _ = np.asarray(x[:1, :8])  # compile + fence

    for iters in (50, 200):
        y = x
        t0 = time.perf_counter()
        for _ in range(iters):
            y = tick(y)
        _ = np.asarray(y[:1, :8])
        dt = time.perf_counter() - t0
        print(f"chained trivial dispatch: {dt/iters*1e3:.3f} ms/call over {iters}",
              flush=True)

    # Same with a mid-size elementwise body (1 MB) to separate dispatch from
    # compute scaling.
    @jax.jit
    def tick2(x):
        return x * 1.000001 + 0.5

    z = jnp.zeros((256, 1024), jnp.float32)
    z = tick2(z)
    _ = np.asarray(z[:1, :8])
    y = z
    t0 = time.perf_counter()
    for _ in range(200):
        y = tick2(y)
    _ = np.asarray(y[:1, :8])
    print(f"chained 1MB elementwise: {(time.perf_counter()-t0)/200*1e3:.3f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
