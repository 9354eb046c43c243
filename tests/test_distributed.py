"""Multi-host bootstrap test: 2 real processes × 2 virtual CPU devices.

The reference is single-process (SURVEY.md §2: ``Distributed`` declared,
never used).  Our multi-host story is "same program, bigger mesh": each host
calls ``tempest_tpu.parallel.distributed.initialize`` and the sharded
pipelines run unchanged.  This test actually executes that bootstrap — two
subprocesses join a localhost coordinator, build the 4-device global mesh,
run one ``sharded_reconstruct_fn`` step across processes, and print a
checksum; the parent runs the *same* program on a 4-device submesh of its
own 8-device CPU backend and the checksums must agree.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse_tag(out: str, tag: str) -> list[float]:
    for line in out.splitlines():
        if line.startswith(tag + " "):
            return [float(v) for v in line.split()[1:]]
    raise AssertionError(f"no {tag} line in worker output:\n{out}")


def _parse_checksum(out: str) -> float:
    return _parse_tag(out, "CHECKSUM")[0]


def test_two_process_bootstrap_matches_single_process():
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out}"
    checksums = [_parse_checksum(o) for o in outs]
    # Every process computed the same replicated result.
    assert checksums[0] == pytest.approx(checksums[1], rel=1e-6)

    # Single-process reference: the identical program on a 4-device submesh.
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import tempest_tpu as tt
    from tempest_tpu.parallel.sharded import sharded_reconstruct_fn
    from tempest_tpu.pipeline.offline import ReconstructionConfig

    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    mode = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
    fs = 1e6
    config = ReconstructionConfig(sample_rate=fs, mode=mode, n_frames=1)
    step = sharded_reconstruct_fn(config, mesh)
    S = config.block_samples
    rng = np.random.default_rng(0)  # must match the worker's generator
    env_sig = rng.standard_normal((4, S)).astype(np.float32) ** 2
    iq_dev = jax.device_put(env_sig, NamedSharding(mesh, P("blocks", None)))
    ema, frames, sync, score = step(
        iq_dev, jnp.zeros(config.render_size, jnp.float32), jnp.float32(0.5)
    )
    ref = float(np.linalg.norm(np.asarray(ema)) + np.asarray(sync).sum())
    assert checksums[0] == pytest.approx(ref, rel=1e-4)

    # Hypothesis searches under the distributed runtime: both processes must
    # agree with each other AND with the same programs on a single-process
    # 2x2 submesh (2-D time x modes search) / local run (static tables).
    from tempest_tpu.parallel.sharded import (
        mode_search_static,
        sharded_mode_search_2d,
    )

    s2d = [_parse_tag(o, "SEARCH2D") for o in outs]
    sst = [_parse_tag(o, "STATIC") for o in outs]
    assert s2d[0] == pytest.approx(s2d[1], rel=1e-5)
    assert sst[0] == pytest.approx(sst[1], rel=1e-5)

    cands = [(nm, tt.ALL_VIDEO_MODES[nm]) for nm in
             ("640x480 @ 60Hz", "800x600 @ 60Hz",
              "1024x768 @ 60Hz", "1152x864 @ 60Hz")]
    mesh2d = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                  ("blocks", "modes"))
    sig = tt.generate_iq(mode, fs, 2 * S, snr_db=25.0, seed=5)
    env_search = np.abs(sig.iq).astype(np.float32)
    ref2d = sharded_mode_search_2d(
        env_search, fs, 60.0, cands, mesh2d, frames_per_shard=1)
    assert s2d[0][0] == pytest.approx(float(ref2d.scores.sum()), rel=1e-4)
    assert int(s2d[0][1]) == ref2d.best_index == 0  # true mode wins
    ref_s = mode_search_static(env_search, fs, 60.0, cands, n_frames=1)
    assert sst[0][0] == pytest.approx(float(ref_s.scores.sum()), rel=1e-4)
    assert int(sst[0][1]) == ref_s.best_index == 0

    # Remaining sharded pipelines (serving batch, 1-D search, band scan,
    # sharded Welch): both processes agree, and each matches the identical
    # program run single-process on a 4-device submesh.
    from tempest_tpu.ops.spectrum import get_welch_sharded
    from tempest_tpu.parallel.sharded import (
        sharded_batched_reconstruct_fn,
        sharded_mode_search,
        sharded_scan_band,
    )

    for tag in ("BATCHED", "SEARCH1D", "SCAN", "COMBINE", "WELCH"):
        a, b = _parse_tag(outs[0], tag), _parse_tag(outs[1], tag)
        assert a == pytest.approx(b, rel=1e-5), (tag, a, b)

    # (a) serving batch reference.
    bstep = sharded_batched_reconstruct_fn(config, mesh)
    rng_b = np.random.default_rng(1)
    env_b = rng_b.standard_normal((4, S)).astype(np.float32) ** 2
    iq_b = jax.device_put(env_b, NamedSharding(mesh, P("blocks")))
    ema_b0 = jax.device_put(np.zeros((4, *config.render_size), np.float32),
                            NamedSharding(mesh, P("blocks")))
    ema_b, _, sync_b, _ = bstep(iq_b, ema_b0, jnp.float32(0.5))
    ref_b = float(np.linalg.norm(np.asarray(ema_b))
                  + np.asarray(sync_b).astype(np.float32).sum())
    assert _parse_tag(outs[0], "BATCHED")[0] == pytest.approx(ref_b, rel=1e-4)

    # (b) 1-D dynamic-geometry search reference.
    ref_1d = sharded_mode_search(env_search, fs, 60.0, cands, mesh,
                                 n_frames=1)
    got_1d = _parse_tag(outs[0], "SEARCH1D")
    assert got_1d[0] == pytest.approx(float(ref_1d.scores.sum()), rel=1e-4)
    assert int(got_1d[1]) == ref_1d.best_index == 0

    # (c) band scan reference.
    rng_s = np.random.default_rng(2)
    n_scan = 1 << 18
    wide = (rng_s.standard_normal(n_scan)
            + 1j * rng_s.standard_normal(n_scan)).astype(np.complex64)
    ref_scan = sharded_scan_band(wide, 4e6,
                                 np.array([-1e6, -0.5e6, 0.5e6, 1e6]),
                                 mesh, chan_bw=1e6, corr_seconds=0.02)
    got_scan = _parse_tag(outs[0], "SCAN")
    assert got_scan[0] == pytest.approx(
        float(ref_scan.prominence_db.sum()), rel=1e-4)
    assert got_scan[1] == pytest.approx(
        float(ref_scan.scores_db.sum()), rel=1e-4)

    # (c2) channel-parallel combining reference (same wideband noise).
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics

    ref_comb = sharded_combine_harmonics(
        wide, 4e6, np.array([-1e6, -0.5e6, 0.5e6, 1e6]), mesh,
        chan_bw=1e6, corr_seconds=0.02)
    got_comb = _parse_tag(outs[0], "COMBINE")
    assert got_comb[0] == pytest.approx(
        float(np.abs(ref_comb.envelope).sum()), rel=1e-3)
    assert got_comb[1] == pytest.approx(float(ref_comb.weights.sum()),
                                        rel=1e-4)

    # (d) sharded Welch reference.
    rng_w = np.random.default_rng(3)
    sig_w = rng_w.standard_normal(8 * 1024).astype(np.float32)
    _, ref_power = get_welch_sharded(fs, sig_w, mesh, fft_size=1024)
    assert _parse_tag(outs[0], "WELCH")[0] == pytest.approx(
        float(np.asarray(ref_power).sum()), rel=1e-4)
