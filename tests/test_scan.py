"""Carrier-frequency scan: batched channeliser + screen-ness scoring.

No reference counterpart (its operator hunts the waterfall by eye and types
the carrier into a textbox, GUI.jl:594-605) — these tests pin the beyond-
parity behaviour: a wideband capture is channelised in one program and the
emission's carrier is found and ranked; a live retunable source is swept and
left tuned to the best dwell.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import tempest_tpu as tt
from tempest_tpu.ops.scan import (
    carrier_score,
    channelize,
    scan_band,
    scan_centers,
)

MODE = tt.ALL_VIDEO_MODES["1024x768 @ 60Hz"]
FS_BASE = 4e6
FS_WIDE = 16e6
F_EMIT = 3e6


def _upconvert(x: np.ndarray, fs_b: float, fs_w: float, f_c: float) -> np.ndarray:
    """Place a baseband capture at carrier offset ``f_c`` inside a wider
    band: frequency-domain zero-pad (exact band-limited upsample) + mix."""
    r = int(fs_w / fs_b)
    X = np.fft.fft(x)
    n = len(x)
    nw = n * r
    Y = np.zeros(nw, np.complex128)
    Y[: n // 2] = X[: n // 2]
    Y[nw - n // 2 :] = X[n // 2 :]
    y = np.fft.ifft(Y) * r
    t = np.arange(nw) / fs_w
    return (y * np.exp(2j * np.pi * f_c * t)).astype(np.complex64)


@pytest.fixture(scope="module")
def wideband():
    cap = tt.generate_iq(MODE, FS_BASE, int(FS_BASE * 0.25), snr_db=25.0, seed=5)
    x = np.asarray(cap.iq, np.complex64)
    wide = _upconvert(x, FS_BASE, FS_WIDE, F_EMIT)
    rng = np.random.default_rng(0)
    wide += (0.05 * (rng.standard_normal(len(wide))
                     + 1j * rng.standard_normal(len(wide)))).astype(np.complex64)
    return x, wide


def test_channelize_tone_mapping():
    """A pure tone must land at the right baseband offset with full power in
    the covering channel and be rejected by a non-covering one.  The public
    surface returns interleaved float32 rows (the device boundary stays
    real, CLAUDE.md) — viewed as complex64 on the host."""
    fs = 16e6
    N = 1 << 18
    t = np.arange(N) / fs
    f0 = 3.25e6
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    words, fs_chan = channelize(x, fs, np.array([3e6, -5e6]), 4e6)
    assert words.dtype == jnp.float32
    chans = np.ascontiguousarray(np.asarray(words)).view(np.complex64)
    assert fs_chan == 4e6
    spec = np.abs(np.fft.fft(chans[0])) ** 2 / chans.shape[1] ** 2
    b = int(np.argmax(spec))
    fb = b / chans.shape[1] * fs_chan
    if fb > fs_chan / 2:
        fb -= fs_chan
    assert abs(fb - (f0 - 3e6)) < fs_chan / chans.shape[1] * 2
    assert spec[b] > 0.98                       # amplitude preserved
    # Channel at -5 MHz does not contain the tone at all.
    assert np.abs(chans[1]).max() < 1e-3


def test_scan_band_localises_emission(wideband):
    _, wide = wideband
    centers = scan_centers(FS_WIDE, 1e6, guard_hz=2e6)
    res = scan_band(wide, FS_WIDE, centers, chan_bw=4e6, corr_seconds=0.1)
    best_c, _, best_fv = res.best()
    # Localisation: within one step of the true carrier (adjacent channels
    # overlap the emission band, so the structured-mass ranking between
    # them is sub-dB; the operator refines by retuning + analyze).
    assert abs(best_c - F_EMIT) <= 1e6, res.best()
    assert abs(best_fv - MODE.refresh) < 0.5
    # Detection: the true-center channel's screen-ness prominence clears
    # every empty channel's by a wide margin.  (Channels catching only the
    # carrier-adjacent low-frequency envelope region score weaker — the
    # comb structure concentrates toward the emission's band edges.)
    prom = res.prominence_db
    on = float(prom[centers == F_EMIT][0])
    off = prom[centers <= -2e6]                 # far from the [1,5] MHz band
    assert on > off.max() + 8.0, (on, off)


def test_carrier_score_discriminates_noise(wideband):
    x, _ = wideband
    s_sig, fv = carrier_score(x, FS_BASE)
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal(len(x))
             + 1j * rng.standard_normal(len(x))).astype(np.complex64)
    s_noise, _ = carrier_score(noise, FS_BASE)
    assert s_sig > s_noise + 8.0, (s_sig, s_noise)
    assert abs(fv - MODE.refresh) < 0.2


class _RetunableSource:
    """Fake SDR: delivers the emission when tuned at F_EMIT, noise elsewhere
    (the contract surface of HardwareSource that scan() relies on)."""

    def __init__(self, emission: np.ndarray, block_size: int):
        self.sample_rate = FS_BASE
        self.block_size = block_size
        self.carrier_freq = 0.0
        self._sig = emission
        self._pos = 0
        self._rng = np.random.default_rng(11)

    def set_carrier(self, freq: float) -> None:
        self.carrier_freq = float(freq)

    def read(self, out: np.ndarray) -> None:
        n = self.block_size
        if abs(self.carrier_freq - F_EMIT) < 0.4e6:
            s = np.take(self._sig, np.arange(self._pos, self._pos + n),
                        mode="wrap")
            self._pos += n
            out[:] = s
        else:
            out[:] = (0.2 * (self._rng.standard_normal(n)
                             + 1j * self._rng.standard_normal(n))
                      ).astype(np.complex64)

    def close(self) -> None:
        pass


def test_runtime_scan_retunes_to_best(wideband):
    from tempest_tpu.runtime.stream import StreamingRuntime

    x, _ = wideband
    src = _RetunableSource(x, block_size=int(FS_BASE * 0.1))
    rt = StreamingRuntime(src, MODE, alpha=0.5)
    rt.start()
    try:
        results = rt.scan([1e6, F_EMIT, 5e6], dwell_seconds=0.1)
    finally:
        rt.stop()
    assert [f for f, _, _, _ in results] == [1e6, F_EMIT, 5e6]
    best = max(results, key=lambda r: r[1])
    assert best[0] == F_EMIT, results
    assert src.carrier_freq == F_EMIT          # left tuned to the winner
    scores = {f: s for f, s, _, _ in results}
    assert scores[F_EMIT] > max(scores[1e6], scores[5e6]) + 5.0, results


def test_scan_emissions_grouping_two_monitors():
    """Two displays in one wideband capture must come back as TWO grouped
    emissions (contiguous detecting channels merged), each with the right
    centroid and refresh — not as six raw channel hits."""
    m2 = tt.ALL_VIDEO_MODES["800x600 @ 72Hz"]
    cap2 = tt.generate_iq(m2, FS_BASE, int(FS_BASE * 0.25), snr_db=25.0,
                          seed=9)
    cap1 = tt.generate_iq(MODE, FS_BASE, int(FS_BASE * 0.25), snr_db=25.0,
                          seed=5)
    wide = (_upconvert(np.asarray(cap1.iq, np.complex64), FS_BASE, FS_WIDE,
                       F_EMIT)
            + 0.7 * _upconvert(np.asarray(cap2.iq, np.complex64), FS_BASE,
                               FS_WIDE, -4e6))
    rng = np.random.default_rng(1)
    wide += (0.05 * (rng.standard_normal(len(wide))
                     + 1j * rng.standard_normal(len(wide)))
             ).astype(np.complex64)
    centers = scan_centers(FS_WIDE, 1e6, guard_hz=2e6)
    res = scan_band(wide.astype(np.complex64), FS_WIDE, centers,
                    chan_bw=4e6, corr_seconds=0.1)
    ems = res.emissions()
    assert len(ems) == 2, (ems, res.prominence_db.round(1).tolist())
    by_center = sorted(ems, key=lambda e: e["center_hz"])
    assert abs(by_center[0]["center_hz"] - (-4e6)) < 1.5e6, by_center
    assert abs(by_center[1]["center_hz"] - F_EMIT) < 1.5e6, by_center
    assert abs(by_center[0]["refresh_hz"] - 72.0) < 0.5
    assert abs(by_center[1]["refresh_hz"] - 60.0) < 0.5


def test_detection_floor_tracks_window_length():
    """Detection thresholds on the MEASURED selection floor of the sweep's
    window geometry, not a constant: pure noise must produce zero emissions
    at very different window lengths even though its absolute prominence
    differs by ~5 dB between them (the old fixed 14 dB threshold only split
    the one geometry it was measured on)."""
    rng = np.random.default_rng(42)
    centers = scan_centers(FS_WIDE, 1e6, guard_hz=2e6)
    floors = {}
    for secs, dur in ((0.02, 0.05), (0.25, 0.3)):
        n = int(FS_WIDE * dur)
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)).astype(np.complex64)
        res = scan_band(noise, FS_WIDE, centers, chan_bw=4e6,
                        corr_seconds=secs)
        assert res.emissions() == [], (secs, res.prominence_db.round(1))
        # Noise prominence sits at the measured floor (same selection max).
        margin = res.prominence_db - res.floor_db
        assert margin.max() < 4.0, (secs, margin.round(2))
        floors[secs] = float(res.floor_db[0])
    # The floor itself tracks the window geometry (measured ~11.6 vs ~6.3):
    # a constant threshold cannot be right for both.
    assert floors[0.02] > floors[0.25] + 3.0, floors


def test_live_scan_calibrated_floor(wideband):
    """Live dwells are CALIBRATED like the offline sweep (r4 verdict: raw
    prominence left the console operator eyeballing 'is 12 dB real?'):
    every dwell reports the measured noise selection floor of its own
    window geometry, noise dwells sit below floor + 5 dB at BOTH dwell
    geometries, the emission clears it at both, and the floor itself
    tracks the geometry (shorter correlation windows → higher selection
    floor), exactly like offline ``emissions()``."""
    from tempest_tpu.runtime.stream import StreamingRuntime

    x, _ = wideband
    floors = {}
    for blk_s in (0.08, 0.3):
        src = _RetunableSource(x, block_size=int(FS_BASE * blk_s))
        rt = StreamingRuntime(src, MODE, alpha=0.5)
        rt.start()
        try:
            res = rt.scan([1e6, F_EMIT, 5e6], dwell_seconds=blk_s,
                          retune_to_best=False)
        finally:
            rt.stop()
        by_f = {f: (p, fl, fv) for f, p, fl, fv in res}
        p_emit, fl, fv = by_f[F_EMIT]
        assert p_emit >= fl + 5.0, (blk_s, p_emit, fl)
        assert abs(fv - MODE.refresh) < 0.2
        for f in (1e6, 5e6):
            p_noise, fl2, _ = by_f[f]
            assert fl2 == fl                 # one floor per scan geometry
            assert p_noise < fl + 5.0, (blk_s, f, p_noise, fl)
        floors[blk_s] = fl
    assert floors[0.08] > floors[0.3] + 1.0, floors


def test_console_scan_command(wideband):
    """The operator console's `scan F1 F2 ...` drives the runtime scan from
    a scripted session and reports per-dwell screen-ness."""
    import io

    from tempest_tpu.runtime.console import OperatorConsole
    from tempest_tpu.runtime.stream import StreamingRuntime

    x, _ = wideband
    src = _RetunableSource(x, block_size=int(FS_BASE * 0.1))
    rt = StreamingRuntime(src, MODE, alpha=0.5)
    out = io.StringIO()
    con = OperatorConsole(rt, commands=[f"scan 1e6 {F_EMIT} 5e6", "quit"],
                          out=out)
    rt.start()
    try:
        con.run()
    finally:
        rt.stop()
    text = out.getvalue()
    assert "screen-ness" in text and "tuned to best" in text
    assert src.carrier_freq == F_EMIT


def test_scan_rejects_non_retunable_source():
    from tempest_tpu.runtime.sources import SyntheticSource
    from tempest_tpu.runtime.stream import StreamingRuntime

    src = SyntheticSource(MODE, FS_BASE, int(FS_BASE * 0.05), snr_db=25.0,
                          seed=1)
    rt = StreamingRuntime(src, MODE, alpha=0.5)
    with pytest.raises(RuntimeError, match="retun"):
        rt.scan([1e6])


def test_sharded_scan_band_matches_single_device(wideband):
    """Hypothesis-parallel scan: channels sharded over the 8-device mesh
    must reproduce the single-device sweep bit-for-bit (channels are
    independent; no collectives)."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_scan_band

    _, wide = wideband
    centers = scan_centers(FS_WIDE, 1e6, guard_hz=2e6)
    mesh = make_mesh(8)
    single = scan_band(wide, FS_WIDE, centers, chan_bw=4e6,
                       corr_seconds=0.1)
    sharded = sharded_scan_band(wide, FS_WIDE, centers, mesh,
                                chan_bw=4e6, corr_seconds=0.1)
    assert sharded.fs_channel == single.fs_channel
    np.testing.assert_array_equal(sharded.scores_db, single.scores_db)
    np.testing.assert_array_equal(sharded.prominence_db,
                                  single.prominence_db)
    np.testing.assert_array_equal(sharded.refresh_hz, single.refresh_hz)
    assert sharded.best()[0] == F_EMIT


def test_sharded_scan_band_fm_and_excise_parity(wideband):
    """The sharded sweep mirrors every single-device knob (r4 verdict:
    it was AM-only): demod='fm' and excise_db produce identical scores AND
    an identical measured noise floor (the floor's surrogate must run the
    matching demodulator); the unsound fm+excise combination is refused
    loudly by both."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_scan_band

    _, wide = wideband
    centers = scan_centers(FS_WIDE, 2e6, guard_hz=2e6)
    mesh = make_mesh(8)
    for kw in ({"demod": "fm"}, {"excise_db": 0.0}):
        single = scan_band(wide, FS_WIDE, centers, chan_bw=4e6,
                           corr_seconds=0.1, **kw)
        sh = sharded_scan_band(wide, FS_WIDE, centers, mesh, chan_bw=4e6,
                               corr_seconds=0.1, **kw)
        # The FM discriminator's atan2 lowers differently under vmap-of-rows
        # vs one batched call — f32-ulp-level deltas (observed 1e-7
        # relative), not a semantics difference.
        np.testing.assert_allclose(sh.scores_db, single.scores_db, rtol=1e-6)
        np.testing.assert_allclose(sh.prominence_db, single.prominence_db,
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(sh.refresh_hz, single.refresh_hz,
                                   rtol=1e-9)
        np.testing.assert_allclose(sh.floor_db, single.floor_db, rtol=1e-6)
    with pytest.raises(ValueError, match="excise_db with demod='fm'"):
        scan_band(wide, FS_WIDE, centers, demod="fm", excise_db=0.0)
    with pytest.raises(ValueError, match="excise_db with demod='fm'"):
        sharded_scan_band(wide, FS_WIDE, centers, mesh, demod="fm",
                          excise_db=0.0)


def test_cli_scan(tmp_path, capsys, wideband):
    from tempest_tpu.app.cli import main

    _, wide = wideband
    p = str(tmp_path / "wide.dat")
    tt.write_complex_binary(wide, p, "single")
    rc = main(["scan", p, "--fs", str(FS_WIDE), "--bw", "4e6",
               "--step", "1e6", "--top", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "best candidate" in out
    best_line = [ln for ln in out.splitlines() if "best candidate" in ln][0]
    assert abs(float(best_line.split(":")[1].split("MHz")[0]) - 3.0) <= 1.0
