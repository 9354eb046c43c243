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


def _parse_checksum(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("CHECKSUM "):
            return float(line.split()[1])
    raise AssertionError(f"no CHECKSUM line in worker output:\n{out}")


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
