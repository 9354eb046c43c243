"""Tests for checkpoints, metrics, and runtime failure propagation."""

import numpy as np
import pytest

import tempest_tpu as tt
from tempest_tpu.runtime.stream import StreamingRuntime
from tempest_tpu.utils.checkpoint import RuntimeState, load_state, save_state
from tempest_tpu.utils.profiling import Metrics

MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
FS = 4e6


def test_checkpoint_roundtrip(tmp_path):
    state = RuntimeState(
        ema=np.random.default_rng(0).random((600, 800)).astype(np.float32),
        abs_pos=123456,
        mode=MODE,
        sample_rate=FS,
        alpha=0.25,
        frames_out=42,
    )
    p = str(tmp_path / "ckpt.npz")
    save_state(state, p)
    back = load_state(p)
    np.testing.assert_array_equal(back.ema, state.ema)
    assert back.abs_pos == 123456
    assert back.mode == MODE
    assert back.alpha == pytest.approx(0.25)
    assert back.frames_out == 42


def test_runtime_checkpoint_resume(tmp_path):
    from tempest_tpu.runtime.sources import SyntheticSource

    block = int(FS * 0.1)
    src = SyntheticSource(MODE, FS, block, snr_db=25.0, seed=7)
    rt = StreamingRuntime(src, MODE, alpha=0.5)
    rt.start()
    try:
        rt.process_blocks(2)
    finally:
        rt.stop()
    p = str(tmp_path / "rt.npz")
    rt.save_checkpoint(p)

    src2 = SyntheticSource(MODE, FS, block, snr_db=25.0, seed=7)
    rt2 = StreamingRuntime(src2, MODE, alpha=0.1)
    rt2.load_checkpoint(p)
    assert rt2.frames_out == rt.frames_out
    assert rt2.alpha == 0.5
    assert rt2._abs_pos == rt._abs_pos
    np.testing.assert_array_equal(rt2._ema, rt._ema)

    # Phase-continuous resume must survive actually processing a block: the
    # ring's sequence-based re-anchoring (ring seq 0 of the NEW source) must
    # not clobber the restored absolute position — the resumed stream's next
    # block continues the checkpointed signal at abs_pos, so after one block
    # the position is abs_pos + block, not block.
    saved_pos = rt2._abs_pos
    rt2.start()
    try:
        rt2.process_blocks(1)
    finally:
        rt2.stop()
    assert rt2._abs_pos == saved_pos + block
    assert rt2.frames_out > rt.frames_out


def test_checkpoint_resumes_full_chain_state(tmp_path):
    """The COMPLETE runtime state rides the checkpoint (r4 verdict: excise/
    fidelity/invert were silently dropped): a resumed session built with
    all-default constructor args must be indistinguishable from the saved
    one — same rebuilt ReconstructionConfig, same health()['combine']."""
    from tempest_tpu.runtime.sources import SyntheticSource

    block = int(FS * 0.2)
    carriers = [-1.2e6, 1.2e6]
    src = SyntheticSource(MODE, FS, block, snr_db=25.0, seed=7)
    # AM + excision (fm + excision is refused by check_excise_demod —
    # its own test asserts the raise).
    rt = StreamingRuntime(src, MODE, alpha=0.5, fidelity=True,
                          fidelity_bins=32, invert=True, combine=carriers,
                          combine_bw=1.5e6, combine_demod="am",
                          combine_excise_db=3.0)
    p = str(tmp_path / "full.npz")
    rt.save_checkpoint(p)

    src2 = SyntheticSource(MODE, FS, block, snr_db=25.0, seed=7)
    rt2 = StreamingRuntime(src2, MODE)  # every knob at its default
    rt2.load_checkpoint(p)
    assert rt2.fidelity is True
    assert rt2.fidelity_bins == 32
    assert rt2.invert is True
    assert rt2._combine_excise == 3.0
    assert rt2.config == rt.config
    assert rt2.health()["combine"] == rt.health()["combine"]

    # FM demod (excise off) and the None-excise NaN sentinel round-trip.
    rt.set_combine(carriers, demod="fm", excise_db=None)
    rt.save_checkpoint(p)
    rt2.load_checkpoint(p)
    assert rt2._combine_demod == "fm"
    assert rt2._combine_excise is None


def test_producer_error_propagates():
    class FailingSource:
        sample_rate = FS
        block_size = 140000

        def __init__(self):
            self.n = 0

        def read(self, out):
            self.n += 1
            if self.n > 2:
                raise IOError("radio unplugged")
            out[:] = 0

        def close(self):
            pass

    rt = StreamingRuntime(FailingSource(), MODE, alpha=0.5, n_frames_per_block=1)
    rt.start()
    try:
        with pytest.raises(RuntimeError, match="sample source failed"):
            rt.process_blocks(10)
    finally:
        rt.stop()


def test_metrics_registry():
    m = Metrics()
    m.count("frames", 30)
    m.count("frames", 30)
    m.gauge("alpha", 0.1)
    snap = m.snapshot()
    assert snap["counters"]["frames"] == 60
    assert snap["gauges"]["alpha"] == 0.1
    assert m.rate("frames") > 0
    assert "frames" in m.json()


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from tempest_tpu.utils.profiling import annotate, trace

    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("toy"):
            _ = jnp.arange(8).sum().block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_file_renderer(tmp_path):
    import numpy as np

    from tempest_tpu.render.screen import FileRenderer

    sink = FileRenderer(prefix=str(tmp_path / "f"), every=2)
    img = np.random.default_rng(0).random((30, 40)).astype(np.float32)
    for _ in range(4):
        sink(img, {})
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == ["f_00000.png", "f_00002.png"]


def test_roofline_report():
    import jax.numpy as jnp

    from tempest_tpu.utils.roofline import RooflineReport, roofline

    rep = roofline(lambda a, b: a @ b, jnp.ones((256, 256)), jnp.ones((256, 256)))
    assert rep.flops > 0
    assert rep.bound() in ("compute", "memory")
    assert rep.speed_of_light_s() > 0
    assert "GFLOP" in rep.summary(measured_s=1e-3)
    # Hand-built report sanity: 1 GFLOP over 1 GB is memory-bound on v5e.
    r = RooflineReport(flops=1e9, bytes_accessed=1e9, transcendentals=0)
    assert r.bound() == "memory"
