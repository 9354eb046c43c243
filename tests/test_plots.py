"""Correlation-evidence rendering: line-plot rasteriser, sparkline, the
timing_evidence API, and the analyze --plots / stream HUD surfaces.

Covers the reference GUI's live correlation panels
(/root/reference/src/GUI.jl:296-356, ScreenRenderer.jl:131-139) re-designed as
headless renderers.
"""

import numpy as np
import pytest

import tempest_tpu as tt
from tempest_tpu.app.cli import main as cli_main
from tempest_tpu.pipeline.offline import estimate_timing, timing_evidence
from tempest_tpu.render.plots import render_line_plot, sparkline

FS = 4e6
MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]


def test_render_line_plot_basic():
    y = np.sin(np.linspace(0, 6 * np.pi, 500))
    img = render_line_plot(y, width=400, height=120, marks=[0.25])
    assert img.shape == (120, 400)
    assert img.dtype == np.float32
    # The curve is dark on light: darkest pixels are the polyline.
    assert img.min() == 0.0 and img.max() > 0.8
    # Mark cursor: a mid-grey vertical line near x = 0.25.
    col = int(round(8 + 0.25 * (400 - 16 - 1)))
    assert np.isclose(img[30, col], 0.35) or img[30, col] == 0.0


def test_render_line_plot_degenerate():
    assert render_line_plot(np.zeros(1)).shape == (240, 800)
    flat = render_line_plot(np.ones(100))  # constant series must not divide by 0
    assert np.isfinite(flat).all()


def test_sparkline_peak_position():
    y = np.zeros(1000)
    y[700] = 10.0
    s = sparkline(y, width=50)
    assert len(s) == 50
    # The peak cell (max-pooled) carries the tallest block.
    assert s[35] == "█"
    assert sparkline(y, width=50, mark=0.7)[34:37].count("|") == 1


def test_timing_evidence_matches_estimate():
    cap = tt.generate_iq(MODE, FS, int(FS * 0.3), snr_db=20.0, seed=5)
    timing, ev = timing_evidence(cap.iq, FS)
    base = estimate_timing(cap.iq, FS)
    assert timing.mode_name == base.mode_name == "640x480 @ 60Hz"
    assert abs(timing.refresh_hz - base.refresh_hz) < 1e-6
    # The refresh band covers [50, 90] Hz descending and the peak mark sits
    # where the detected refresh lies.
    assert ev.rates_hz[0] > ev.rates_hz[-1]
    assert ev.rates_hz[-1] <= timing.refresh_hz <= ev.rates_hz[0]
    assert 0.0 <= ev.rate_mark() <= 1.0
    # The evidence peak is real: the band max is near the detected rate.
    peak_rate = float(ev.rates_hz[np.argmax(ev.gamma_rates)])
    assert abs(peak_rate - timing.refresh_hz) < 0.5
    # Line window brackets the detected line period.
    assert ev.line_lags[0] <= ev.line_lag <= ev.line_lags[-1]
    assert len(ev.gamma_lines) == len(ev.line_lags)


def test_cli_analyze_plots(tmp_path, capsys):
    cap = tmp_path / "c.dat"
    assert cli_main([
        "synth", "--mode", "640x480 @ 60Hz", "--fs", str(FS),
        "--seconds", "0.3", "--snr", "20", "--out", str(cap),
    ]) == 0
    prefix = str(tmp_path / "ev")
    assert cli_main([
        "analyze", str(cap), "--fs", str(FS), "--plots", prefix,
    ]) == 0
    text = capsys.readouterr().out
    assert "refresh evidence" in text and "line evidence" in text
    for suffix in ("_refresh.png", "_lines.png"):
        data = (tmp_path / f"ev{suffix}").read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_stream_correlate_keeps_evidence():
    from tempest_tpu.render.screen import TerminalRenderer
    from tempest_tpu.runtime.sources import SyntheticSource
    from tempest_tpu.runtime.stream import StreamingRuntime

    block = int(FS * 0.15)
    src = SyntheticSource(MODE, FS, block, snr_db=25.0, seed=8)
    rt = StreamingRuntime(src, MODE, alpha=0.5)
    rt.start()
    try:
        timing = rt.correlate(keep_evidence=True)
        assert rt.last_evidence is not None
        assert rt.corr_spark and "peak" in rt.corr_spark
        assert abs(timing.refresh_hz - 60.0) < 0.1
        # The HUD line shows the sparkline during streaming.
        seen = []
        rt.process_blocks(1, sink=lambda img, info: seen.append(info))
        assert seen and seen[0].get("spark") == rt.corr_spark
        out = TerminalRenderer(rows=6, cols=20).render(np.zeros((10, 10)), seen[0])
        assert rt.corr_spark in out
    finally:
        rt.stop()
