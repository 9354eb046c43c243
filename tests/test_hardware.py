"""HardwareSource (SoapySDR-guarded) unit tests with a fake driver module.

No real SDR stack exists in CI, so these tests inject a recording fake
``SoapySDR`` module into ``sys.modules`` and verify the full driver contract:
open/configure/stream setup, partial-read draining, live retuning
(``set_carrier``/``set_gain``/``set_sample_rate``), and teardown — the
surface of the reference's ``openSDR``/``recv!``/``update*!`` layer
(``/root/reference/src/AtomicAbstractSDRs.jl:273-306``, ``GUI.jl:609-658``).
"""

import sys
import types

import numpy as np
import pytest

import tempest_tpu as tt
from tempest_tpu.runtime.sources import HardwareSource, open_source
from tempest_tpu.runtime.stream import StreamingRuntime


def _fake_soapy(record: list, schedule: list | None = None) -> types.ModuleType:
    """A minimal SoapySDR lookalike that records every driver call and
    serves a deterministic counter signal in ≤1000-sample partial reads.

    ``schedule``: optional list of readStream outcomes consumed in order —
    a negative int is returned as that error code (no data written), a
    positive int caps that read's sample count.  Once drained, reads revert
    to the default ≤1000-sample behaviour.  Lets tests script timeout /
    overflow / short-read storms (the live conditions a real radio throws)."""
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = 1
    mod.SOAPY_SDR_CF32 = "CF32"
    mod.SOAPY_SDR_TIMEOUT = -1
    mod.SOAPY_SDR_OVERFLOW = -4
    schedule = list(schedule or [])

    class Device:
        def __init__(self, args):
            record.append(("open", dict(args)))
            self._n = 0

        def setSampleRate(self, d, ch, r):
            record.append(("rate", float(r)))

        def setFrequency(self, d, ch, f):
            record.append(("freq", float(f)))

        def setGain(self, d, ch, g):
            record.append(("gain", float(g)))

        def setupStream(self, d, fmt, chans):
            record.append(("setup", fmt, list(chans)))
            return "stream-handle"

        def activateStream(self, s):
            record.append(("activate", s))

        def readStream(self, s, bufs, n):
            m = min(n, 1000)  # force the partial-read loop
            if schedule:
                step = schedule.pop(0)
                if step < 0:
                    class SR:
                        ret = step

                    return SR()
                m = min(m, step)
            buf = bufs[0]
            buf[:m] = (np.arange(self._n, self._n + m) % 7).astype(np.complex64)
            self._n += m

            class SR:
                ret = m

            return SR()

        def deactivateStream(self, s):
            record.append(("deactivate", s))

        def closeStream(self, s):
            record.append(("close", s))

    mod.Device = Device
    return mod


def test_hardware_source_full_contract(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record))
    src = HardwareSource("rtlsdr", 764e6, 2e6, 48.0, block_size=4096)
    assert ("open", {"driver": "rtlsdr"}) in record
    assert ("rate", 2e6) in record and ("freq", 764e6) in record
    assert ("gain", 48.0) in record
    assert ("activate", "stream-handle") in record

    # read drains partial driver reads into one whole block.
    out = np.empty(4096, np.complex64)
    src.read(out)
    np.testing.assert_array_equal(out.real, np.arange(4096) % 7)

    # Consecutive reads continue the stream.
    src.read(out)
    np.testing.assert_array_equal(out.real, np.arange(4096, 8192) % 7)

    # Live retuning (GUI.jl:609-658 surface).
    src.set_carrier(433e6)
    src.set_gain(20.0)
    src.set_sample_rate(4e6)
    assert ("freq", 433e6) in record
    assert ("gain", 20.0) in record
    assert ("rate", 4e6) in record
    assert src.carrier_freq == 433e6 and src.gain == 20.0
    assert src.sample_rate == 4e6

    src.close()
    assert ("deactivate", "stream-handle") in record
    assert ("close", "stream-handle") in record
    src.close()  # idempotent
    assert record.count(("close", "stream-handle")) == 1


def test_hardware_backend_driver_mapping(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record))
    HardwareSource("pluto", 400e6, 3e6, 30.0, block_size=64)
    assert ("open", {"driver": "plutosdr"}) in record
    with pytest.raises(ValueError, match="unknown SDR backend"):
        HardwareSource("hackrf", 400e6, 3e6, 30.0, block_size=64)


def test_open_source_hardware_dispatch(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record))
    src = open_source("uhd", sample_rate=20e6, block_size=1024,
                      carrier_freq=764e6, gain=50.0)
    assert isinstance(src, HardwareSource)
    assert ("open", {"driver": "uhd"}) in record


def test_runtime_retune_through_hardware_source(monkeypatch):
    """StreamingRuntime.set_carrier/set_gain forward to the live source —
    the control surface the reference exposes as GUI callbacks."""
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record))
    mode = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
    fs = 4e6
    src = HardwareSource("bladerf", 764e6, fs, 40.0, block_size=int(fs * 0.1))
    rt = StreamingRuntime(src, mode, alpha=0.5)
    rt.start()
    try:
        rt.process_blocks(1)
        rt.set_carrier(600e6)
        rt.set_gain(10.0)
    finally:
        rt.stop()
    assert ("freq", 600e6) in record
    assert ("gain", 10.0) in record
    assert rt.frames_out > 0


def test_read_survives_timeout_and_overflow_storm(monkeypatch):
    """TIMEOUT retries and OVERFLOW counts-and-continues — the producer must
    survive both routine live conditions (reference parity:
    AtomicAbstractSDRs.jl:284-306 producer never dies, :263-268 overflow is
    measured, not fatal)."""
    record = []
    # A storm: timeouts and overflows interleaved with partial reads.
    storm = [-1, -1, 500, -4, -1, 250, -4, -4, 250, -1]
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record, storm))
    src = HardwareSource("rtlsdr", 764e6, 2e6, 48.0, block_size=3000)
    out = np.empty(3000, np.complex64)
    src.read(out)  # must complete despite the storm
    np.testing.assert_array_equal(out.real, np.arange(3000) % 7)
    assert src.overflows == 3
    assert src.timeouts == 4


def test_read_raises_on_fatal_code(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR",
                        _fake_soapy(record, [500, -2]))  # STREAM_ERROR
    src = HardwareSource("rtlsdr", 764e6, 2e6, 48.0, block_size=3000)
    out = np.empty(3000, np.complex64)
    with pytest.raises(RuntimeError, match="fatal error -2"):
        src.read(out)


def test_read_raises_after_consecutive_timeout_limit(monkeypatch):
    """An unresponsive device (nothing but timeouts) must eventually raise —
    not spin the producer forever."""
    record = []
    monkeypatch.setitem(sys.modules, "SoapySDR",
                        _fake_soapy(record, [-1] * 10))
    src = HardwareSource("rtlsdr", 764e6, 2e6, 48.0, block_size=64,
                         timeout_limit=5)
    out = np.empty(64, np.complex64)
    with pytest.raises(RuntimeError, match="unresponsive"):
        src.read(out)
    assert src.timeouts == 5


def test_runtime_health_surfaces_source_counters(monkeypatch):
    """Driver-side overflow/timeout counts appear in health() so an operator
    can see the radio struggling (print_summary parity)."""
    record = []
    storm = [-4, -1, -4]  # before the first full block
    monkeypatch.setitem(sys.modules, "SoapySDR", _fake_soapy(record, storm))
    mode = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
    fs = 4e6
    src = HardwareSource("uhd", 764e6, fs, 40.0, block_size=int(fs * 0.1))
    rt = StreamingRuntime(src, mode, alpha=0.5)
    rt.start()
    try:
        rt.process_blocks(1)
        h = rt.health()
    finally:
        rt.stop()
    assert h["source_overflows"] == 2
    assert h["source_timeouts"] == 1


def test_runtime_retune_rejected_for_untunable_sources():
    from tempest_tpu.runtime.sources import SyntheticSource

    mode = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
    src = SyntheticSource(mode, 4e6, int(4e6 * 0.1), snr_db=25.0)
    rt = StreamingRuntime(src, mode, alpha=0.5)
    with pytest.raises(AttributeError, match="carrier"):
        rt.set_carrier(1e9)
    with pytest.raises(AttributeError, match="gain"):
        rt.set_gain(1.0)
