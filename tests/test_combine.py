"""Multi-harmonic combining (ops.combine + pipeline.combined_reconstruct):
MRC weighting, polarity correction, carrier auto-discovery, and the
envelope input format."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tempest_tpu as tt
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.pipeline.offline import (
    ReconstructionConfig,
    combined_reconstruct,
    reconstruct_frames,
)
from tempest_tpu.render.screen import aligned_psnr

MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
FS = 32e6
CARRIERS = [-8e6, 2.5e6, 11e6]


def _truth(cap):
    return np.asarray(downgrade_image(jnp.asarray(cap.frame)))


def test_combining_beats_best_single_channel():
    """Three harmonics at [1.0, 0.7, 0.5] relative amplitude: the MRC fusion
    must beat the strongest single carrier (measured +0.6-0.7 dB here,
    +1.3-1.4 at 0 dB SNR) and weight the channels in strength order."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   snr_db=6.0, seed=5)
    truth = _truth(cap)
    t1, r1, c1 = combined_reconstruct(cap.iq, FS, [CARRIERS[0]], alpha=0.7)
    t3, r3, c3 = combined_reconstruct(cap.iq, FS, CARRIERS, alpha=0.7)
    assert t3.mode_name == "640x480 @ 60Hz"
    p1, _ = aligned_psnr(truth, r1.image)
    p3, _ = aligned_psnr(truth, r3.image)
    assert p3 > p1 + 0.4, f"single {p1:.2f}, combined {p3:.2f}"
    # MRC weights follow channel strength.
    assert c3.weights[0] > c3.weights[1] > c3.weights[2] > 0.1
    assert abs(c3.weights.sum() - 1.0) < 1e-6


def test_inverted_harmonic_polarity_corrected():
    """A harmonic with inverted modulation (negative depth) must be flipped
    before summation, not cancel the others."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   depths=[0.8, -0.8, 0.8],
                                   snr_db=6.0, seed=5)
    truth = _truth(cap)
    t1, r1, _ = combined_reconstruct(cap.iq, FS, [CARRIERS[0]], alpha=0.7)
    t3, r3, c3 = combined_reconstruct(cap.iq, FS, CARRIERS, alpha=0.7)
    np.testing.assert_array_equal(c3.polarity, [1.0, -1.0, 1.0])
    p1, _ = aligned_psnr(truth, r1.image)
    p3, _ = aligned_psnr(truth, r3.image)
    assert p3 > p1 + 0.4, f"single {p1:.2f}, combined {p3:.2f}"


def test_combine_single_carrier_is_channel_envelope():
    """K=1 identity: with one carrier the MRC fusion must reduce exactly to
    that channel's amplitude envelope (weight 1, polarity +, DC re-added) —
    pins the mean-removal/re-add algebra."""
    from tempest_tpu.ops.scan import channelize

    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.12), [CARRIERS[0]],
                                   snr_db=10.0, seed=7)
    comb = tt.combine_harmonics(cap.iq, FS, [CARRIERS[0]])
    ch, fs_chan = channelize(cap.iq.view(np.float32), FS, [CARRIERS[0]], 4e6)
    ch = np.asarray(ch)[0]
    env = np.abs(ch[0::2] + 1j * ch[1::2])
    assert comb.fs_channel == fs_chan
    np.testing.assert_allclose(comb.envelope, env, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(comb.weights, [1.0])
    np.testing.assert_array_equal(comb.polarity, [1.0])


def test_interferer_hit_channel_downweighted():
    """A strong CW interferer inside one channel: its envelope beat is
    sample-CORRELATED, so a white-noise MRC model counts it as signal; the
    frame-periodic MRC (on-comb minus off-comb dots, the two-pass default)
    sees no frame-periodic power from it and crushes the channel's weight.
    Measured here: weight 0.43 -> ~0.015, fused PSNR 7.5 -> 13.3 (clean
    reference 13.6)."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.7],
                                   snr_db=6.0, seed=5)
    truth = _truth(cap)
    n = len(cap.iq)
    cw = (3.0 * np.exp(2j * np.pi * 11.3e6 / FS * np.arange(n))
          ).astype(np.complex64)
    _, r0, c0 = combined_reconstruct(cap.iq, FS, CARRIERS, alpha=0.7)
    _, r1, c1 = combined_reconstruct((cap.iq + cw).astype(np.complex64),
                                     FS, CARRIERS, alpha=0.7)
    assert c1.weights[2] < 0.1, c1.weights
    assert c1.weights[0] > c1.weights[1] > 0.2
    p0, _ = aligned_psnr(truth, r0.image)
    p1, _ = aligned_psnr(truth, r1.image)
    assert p1 > p0 - 0.8, f"clean {p0:.2f}, interfered {p1:.2f}"


def test_combine_manual_mode_override():
    """--combine with an explicit --mode: the detected mode is replaced but
    the fusion and measured refresh are kept (the manual-mode path of the
    plain chain, for captures too degraded to auto-detect)."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.2), CARRIERS[:2],
                                   snr_db=8.0, seed=3)
    t, r, c = combined_reconstruct(cap.iq, FS, CARRIERS[:2], alpha=0.7,
                                   mode=MODE)
    assert t.mode_name == "640x480 @ 60Hz"
    assert t.mode is MODE
    assert r.image.shape == (600, 800)


def test_empty_channel_gets_zero_weight():
    """A carrier with no emission must not dilute the fusion: its comb mass
    sits far under the anchor's, so the 40 dB gate zeroes it."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   snr_db=6.0, seed=5)
    _, _, c4 = combined_reconstruct(cap.iq, FS, CARRIERS + [-13e6],
                                    alpha=0.7)
    assert c4.weights[3] < 0.02, c4.weights
    assert c4.weights[:3].min() > 0.1


def test_auto_discovery_finds_all_harmonics():
    """centers_hz=None: scan_band + emissions() grouping must find every
    radiating carrier (same refresh ⇒ same screen) and the fusion must beat
    the best single channel."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   snr_db=6.0, seed=5)
    truth = _truth(cap)
    timing, recon, comb = combined_reconstruct(cap.iq, FS, None, alpha=0.7)
    assert timing.mode_name == "640x480 @ 60Hz"
    assert len(comb.centers_hz) == 3
    # Every discovered center lies within one channel step of a true carrier.
    for c in comb.centers_hz:
        assert min(abs(c - t) for t in CARRIERS) <= 2e6, comb.centers_hz
    t1, r1, _ = combined_reconstruct(cap.iq, FS, [CARRIERS[0]], alpha=0.7)
    p1, _ = aligned_psnr(truth, r1.image)
    pa, _ = aligned_psnr(truth, recon.image)
    assert pa > p1 + 0.4, f"single {p1:.2f}, auto-combined {pa:.2f}"


def test_cli_synth_harmonics_combine(tmp_path, capsys):
    """CLI surface: synth --harmonics writes a multi-carrier capture that
    reconstruct --combine auto locks onto and fuses."""
    from tempest_tpu.app.cli import main as cli_main

    cap = tmp_path / "h.dat"
    out = tmp_path / "c.png"
    assert cli_main([
        "synth", "--mode", "640x480 @ 60Hz", "--fs", str(FS),
        "--seconds", "0.55", "--snr", "8",
        "--harmonics=-8e6,2.5e6,11e6", "--out", str(cap),
    ]) == 0
    assert cli_main([
        "reconstruct", str(cap), "--fs", str(FS), "--alpha", "0.7",
        "--combine", "auto", "--out", str(out),
    ]) == 0
    text = capsys.readouterr().out
    assert "640x480 @ 60Hz" in text
    assert text.count("  carrier ") == 3
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_reconstruct_all_emissions_two_screens(tmp_path, capsys):
    """Two monitors in one wideband capture (distinct refresh rates): the
    band scan groups their emissions into two screens, each reconstructed
    and mode-identified; the CLI writes one image per screen."""
    mode2 = tt.ALL_VIDEO_MODES["800x600 @ 72Hz"]
    n = int(FS * 0.45)
    cap_a = tt.generate_iq(MODE, FS, n, snr_db=12.0, seed=2,
                           carrier_offset_hz=-9e6)
    cap_b = tt.generate_iq(mode2, FS, n, snr_db=12.0, seed=3,
                           carrier_offset_hz=8e6)
    iq = (cap_a.iq + cap_b.iq).astype(np.complex64)
    results = tt.reconstruct_all_emissions(iq, FS, alpha=0.7)
    assert len(results) == 2
    names = {t.mode_name for t, _, _ in results}
    assert names == {"640x480 @ 60Hz", "800x600 @ 72Hz"}
    # Each image correlates with ITS OWN truth far better than the other's.
    for timing, recon, comb in results:
        cap = cap_a if timing.mode_name == "640x480 @ 60Hz" else cap_b
        other = cap_b if cap is cap_a else cap_a
        p_own, _ = aligned_psnr(_truth(cap), recon.image)
        p_other, _ = aligned_psnr(_truth(other), recon.image)
        assert p_own > p_other + 1.5, (timing.mode_name, p_own, p_other)
    # CLI: --combine all writes one PNG per screen.
    from tempest_tpu.app.cli import main as cli_main
    from tempest_tpu.io.dat import write_complex_binary

    capf = tmp_path / "two.dat"
    write_complex_binary(iq, str(capf), "single")
    assert cli_main([
        "reconstruct", str(capf), "--fs", str(FS), "--alpha", "0.7",
        "--combine", "all", "--out", str(tmp_path / "s.png"),
    ]) == 0
    text = capsys.readouterr().out
    assert "2 screen(s) detected" in text
    for i in (1, 2):
        png = tmp_path / f"s_{i}.png"
        assert png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def _stream_ema(path, fs, mode, centers, blocks=5, alpha=0.5, bw=2e6,
                demod="am"):
    from tempest_tpu.runtime.sources import open_source
    from tempest_tpu.runtime.stream import StreamingRuntime

    src = open_source("replay", sample_rate=fs, block_size=int(fs * 0.25),
                      path=str(path))
    rt = StreamingRuntime(src, mode, alpha=alpha, combine=centers,
                          combine_bw=bw, combine_demod=demod)
    rt.start()
    try:
        img = rt.process_blocks(blocks)
    finally:
        rt.stop()
    return img, rt


def test_streaming_combine_beats_single_carrier(tmp_path):
    """Live multi-harmonic combining: the runtime channelises every block,
    MRC-fuses the envelopes on device, and the carry-phase chain runs at
    the channel rate.  The fusion must beat the strongest single carrier
    on the SAME stream, keep frame registration across block boundaries
    (the phase-scale math), and expose weights through health()."""
    from tempest_tpu.io.dat import write_complex_binary

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 1.0], snr_db=0.0, seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")
    truth = _truth(cap)
    img1, _ = _stream_ema(path, fs, MODE, [carriers[0]], alpha=0.7)
    img2, rt = _stream_ema(path, fs, MODE, carriers, alpha=0.7)
    p1, _ = aligned_psnr(truth, img1)
    p2, _ = aligned_psnr(truth, img2)
    assert p2 > p1 + 0.4, f"single {p1:.2f}, combined {p2:.2f}"
    info = rt.health()["combine"]
    assert info["centers_hz"] == carriers
    w = info["weights"]
    assert min(w) > 0.3, w


def test_streaming_combine_composes_with_fidelity(tmp_path):
    """Live combine + the quantised exact-cut fidelity chain: the fused
    envelope feeds the phase-binned tables at the channel rate (both step
    families consume input_format='envelope')."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.runtime.sources import open_source
    from tempest_tpu.runtime.stream import StreamingRuntime

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=10.0,
                                   seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")
    src = open_source("replay", sample_rate=fs, block_size=int(fs * 0.25),
                      path=str(path))
    rt = StreamingRuntime(src, MODE, alpha=0.6, combine=carriers,
                          combine_bw=2e6, fidelity=True, fidelity_bins=16)
    assert rt.config.input_format == "envelope"
    assert rt.config.subsample_align and rt.config.phase_bins == 16
    rt.start()
    try:
        img = rt.process_blocks(5)
    finally:
        rt.stop()
    p, _ = aligned_psnr(_truth(cap), img)
    assert p > 10.0, p


def test_streaming_combine_auto_and_console(tmp_path, capsys):
    """`combine auto` discovers the carriers from the live ring (sequence-
    fenced window) and hot-swaps the chain; `combine off` swaps back; the
    console command drives both paths."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.runtime.console import OperatorConsole
    from tempest_tpu.runtime.sources import open_source
    from tempest_tpu.runtime.stream import StreamingRuntime

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=8.0, seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")
    src = open_source("replay", sample_rate=fs, block_size=int(fs * 0.25),
                      path=str(path))
    rt = StreamingRuntime(src, MODE, alpha=0.5, combine_bw=2e6)
    rt.start()
    try:
        found = rt.combine_auto(seconds=0.3)
        assert len(found) >= 2, found
        for c in carriers:
            assert min(abs(f - c) for f in found) <= 1e6, (found, c)
        assert rt.config.input_format == "envelope"
        rt.process_blocks(1)
        assert rt.combine_weights is not None
        console = OperatorConsole(rt, None)
        console.dispatch("combine status")
        console.dispatch("combine off")
        assert rt.config.input_format == "iq_interleaved"
        console.dispatch(f"combine {carriers[0]},{carriers[1]}")
        assert rt.config.input_format == "envelope"
        assert rt._combine_centers == carriers
    finally:
        rt.stop()
    out = capsys.readouterr().out
    assert "combining" in out


def test_mesh_streaming_combine(tmp_path):
    """LIVE combine on the MESH runtime (round 5): the carrier-sharded
    front (all_gather masses + one-hot-psum anchor + psum fusion) fuses
    each block on the mesh, the envelope stays DEVICE-RESIDENT between
    the two dispatches, and the time-sharded chain consumes the previous
    block's envelope with the new one's head as the lookahead tail — the
    full multi-chip live-fusion pipeline, streaming.  Weights must match
    the single-chip live runtime's on the same stream and the fused image
    must reach comparable PSNR."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.runtime.mesh_stream import MeshStreamingRuntime
    from tempest_tpu.runtime.sources import open_source

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=8.0, seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")
    truth = _truth(cap)

    block = 1 << 21          # pow2 so the FFT window covers the block
    src = open_source("replay", sample_rate=fs, block_size=block,
                      path=str(path))
    rt = MeshStreamingRuntime(src, MODE, make_mesh(4), alpha=0.6,
                              combine=carriers, combine_bw=2e6)
    assert rt.config.input_format == "envelope"
    h = rt.health()
    assert h["combine"]["centers_hz"] == carriers
    rt.start()
    try:
        img = rt.process_blocks(3)
    finally:
        rt.stop()
    w_mesh = np.asarray(rt.combine_weights[0])

    img1, rt1 = _stream_ema(path, fs, MODE, carriers, blocks=5, alpha=0.6)
    w_single = np.asarray(rt1.combine_weights[0])
    np.testing.assert_allclose(w_mesh, w_single, atol=0.03)
    p_mesh, _ = aligned_psnr(truth, img)
    p_single, _ = aligned_psnr(truth, img1)
    assert p_mesh > p_single - 1.0, (p_mesh, p_single)
    assert p_mesh > 10.0, p_mesh


def test_mesh_combine_composes_with_fidelity(tmp_path):
    """Mesh live combine + the quantised fidelity chain compose: the
    carrier-sharded front's fused envelope feeds the per-shard-bin
    exact-cut tables at the channel rate (both consume
    input_format='envelope'), all on one mesh."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.runtime.mesh_stream import MeshStreamingRuntime
    from tempest_tpu.runtime.sources import open_source

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=10.0,
                                   seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")
    src = open_source("replay", sample_rate=fs, block_size=1 << 21,
                      path=str(path))
    rt = MeshStreamingRuntime(src, MODE, make_mesh(4), alpha=0.6,
                              fidelity=True, fidelity_bins=16,
                              combine=carriers, combine_bw=2e6)
    assert rt.config.input_format == "envelope"
    assert rt.config.subsample_align and rt.config.phase_bins == 16
    rt.start()
    try:
        img = rt.process_blocks(3)
    finally:
        rt.stop()
    p, _ = aligned_psnr(_truth(cap), img)
    assert p > 10.0, p


def test_combine_auto_reanchors_wrong_refresh(tmp_path):
    """combine_auto must re-anchor the runtime mode at the DISCOVERED
    screen's refresh (r4 verdict): with a deliberately wrong mode (+8 Hz)
    the front would bake its comb gate and frame lags at the wrong rate and
    silently degrade every MRC weight.  The wrong-mode runtime's fused
    weights must match the correct-refresh run after discovery."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.runtime.sources import open_source
    from tempest_tpu.runtime.stream import StreamingRuntime
    from tempest_tpu.video.modes import VideoMode

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=8.0, seed=4)
    path = tmp_path / "h.dat"
    write_complex_binary(cap.iq, str(path), "single")

    def run(mode):
        src = open_source("replay", sample_rate=fs,
                          block_size=int(fs * 0.25), path=str(path))
        rt = StreamingRuntime(src, mode, alpha=0.5, combine_bw=2e6)
        rt.start()
        try:
            found = rt.combine_auto(seconds=0.3)
            assert len(found) >= 2, found
            rt.process_blocks(1)
            w = np.asarray(rt.combine_weights[0])
        finally:
            rt.stop()
        return rt, w

    wrong = VideoMode(MODE.width, MODE.height, MODE.refresh + 8.0)
    rt_wrong, w_wrong = run(wrong)
    assert abs(rt_wrong.mode.refresh - MODE.refresh) < 0.1, \
        rt_wrong.mode.refresh
    _, w_right = run(MODE)
    np.testing.assert_allclose(w_wrong, w_right, atol=0.02)


def test_streaming_combine_survives_checkpoint_resume(tmp_path):
    """Combine state (carriers + channel bandwidth) rides the checkpoint:
    a resumed runtime rebuilds the fused chain without being told."""
    from tempest_tpu.io.dat import write_complex_binary
    from tempest_tpu.runtime.sources import open_source
    from tempest_tpu.runtime.stream import StreamingRuntime

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 0.8], snr_db=10.0,
                                   seed=4)
    path = tmp_path / "h.dat"
    ckpt = tmp_path / "state.npz"
    write_complex_binary(cap.iq, str(path), "single")

    src = open_source("replay", sample_rate=fs, block_size=int(fs * 0.25),
                      path=str(path))
    rt = StreamingRuntime(src, MODE, alpha=0.6, combine=carriers,
                          combine_bw=2e6)
    rt.start()
    try:
        rt.process_blocks(2)
    finally:
        rt.stop()
    rt.save_checkpoint(str(ckpt))

    src2 = open_source("replay", sample_rate=fs, block_size=int(fs * 0.25),
                       path=str(path))
    rt2 = StreamingRuntime(src2, MODE, alpha=0.6)  # no combine args
    rt2.load_checkpoint(str(ckpt))
    assert rt2._combine_centers == carriers
    assert rt2._combine_bw == 2e6
    assert rt2.config.input_format == "envelope"
    assert rt2.frames_out == rt.frames_out
    rt2.start()
    try:
        img = rt2.process_blocks(2)
    finally:
        rt2.stop()
    assert rt2.frames_out > rt.frames_out
    p, _ = aligned_psnr(_truth(cap), img)
    assert p > 10.0, p


def test_cli_survey_two_screens(tmp_path, capsys):
    """`cli survey`: the one-shot wideband workflow writes a report dir —
    band evidence plot, one image per monitor, text summary."""
    from tempest_tpu.app.cli import main as cli_main
    from tempest_tpu.io.dat import write_complex_binary

    mode2 = tt.ALL_VIDEO_MODES["800x600 @ 72Hz"]
    n = int(FS * 0.45)
    a = tt.generate_iq(MODE, FS, n, snr_db=12.0, seed=2,
                       carrier_offset_hz=-9e6)
    b = tt.generate_iq(mode2, FS, n, snr_db=12.0, seed=3,
                       carrier_offset_hz=8e6)
    capf = tmp_path / "two.dat"
    write_complex_binary((a.iq + b.iq).astype(np.complex64), str(capf),
                         "single")
    out = tmp_path / "report"
    assert cli_main(["survey", str(capf), "--fs", str(FS),
                     "--out", str(out)]) == 0
    text = capsys.readouterr().out
    assert "2 screen(s)" in text
    assert "640x480 @ 60Hz" in text and "800x600 @ 72Hz" in text
    assert (out / "band.png").read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    for i in (1, 2):
        assert (out / f"screen_{i}.png").exists()
    summary = (out / "survey.txt").read_text()
    assert "screen 2:" in summary


def test_no_emission_paths_fail_gracefully(tmp_path, capsys):
    """Pure-noise capture: `reconstruct --combine auto` prints a hint and
    returns 2 (no traceback); `survey` writes the band plot + summary and
    also returns 2."""
    from tempest_tpu.app.cli import main as cli_main
    from tempest_tpu.io.dat import write_complex_binary

    rng = np.random.default_rng(0)
    n = int(FS * 0.3)
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
    capf = tmp_path / "noise.dat"
    write_complex_binary(noise, str(capf), "single")
    rc = cli_main(["reconstruct", str(capf), "--fs", str(FS),
                   "--combine", "auto", "--out", str(tmp_path / "x.png")])
    assert rc == 2
    out = capsys.readouterr().out
    assert "error:" in out and "hint:" in out
    rc = cli_main(["survey", str(capf), "--fs", str(FS),
                   "--out", str(tmp_path / "rep")])
    assert rc == 2
    assert (tmp_path / "rep" / "band.png").exists()
    assert "no emissions" in (tmp_path / "rep" / "survey.txt").read_text()


def test_combine_invariances():
    """Structural invariants of the fusion: (a) input scale cancels — the
    weights are self-normalised and the envelope scales linearly; (b) the
    carrier ORDER is irrelevant — weights/polarity/mass permute with it and
    the fused envelope is unchanged (the anchor choice is order-free)."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.12), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   snr_db=8.0, seed=9)
    base = tt.combine_harmonics(cap.iq, FS, CARRIERS)
    # (a) scale invariance
    scaled = tt.combine_harmonics(cap.iq * 3.0, FS, CARRIERS)
    np.testing.assert_allclose(scaled.weights, base.weights, atol=1e-4)
    np.testing.assert_array_equal(scaled.polarity, base.polarity)
    np.testing.assert_allclose(scaled.envelope, 3.0 * base.envelope,
                               rtol=1e-4)
    # (b) permutation equivariance
    perm = [2, 0, 1]
    permuted = tt.combine_harmonics(cap.iq, FS,
                                    [CARRIERS[i] for i in perm])
    np.testing.assert_allclose(permuted.weights, base.weights[perm],
                               atol=1e-5)
    np.testing.assert_array_equal(permuted.polarity, base.polarity[perm])
    np.testing.assert_allclose(permuted.envelope, base.envelope,
                               rtol=1e-4, atol=1e-5 * base.envelope.max())


def test_sharded_combine_matches_single_device():
    """Channel-parallel combining on the 8-device mesh must match the
    single-device kernel to f32 reassociation: same weights/polarity/mass
    (the global anchor + gates are exact — driven by all-gathered scalars),
    envelope within a few ULP (psum reassociation)."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics

    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.3), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.5],
                                   depths=[0.8, -0.8, 0.8],
                                   snr_db=6.0, seed=5)
    ref = tt.combine_harmonics(cap.iq, FS, CARRIERS)
    sh = sharded_combine_harmonics(cap.iq, FS, CARRIERS, make_mesh(8))
    np.testing.assert_array_equal(ref.polarity, sh.polarity)
    np.testing.assert_array_equal(ref.mass_db, sh.mass_db)
    np.testing.assert_array_equal(ref.refresh_hz, sh.refresh_hz)
    np.testing.assert_allclose(ref.weights, sh.weights, rtol=1e-5)
    scale = np.abs(ref.envelope).max()
    np.testing.assert_allclose(sh.envelope, ref.envelope, atol=1e-5 * scale)
    assert sh.fs_channel == ref.fs_channel


def test_sharded_combined_reconstruct_composition():
    """ONE multi-chip program: carrier-sharded fusion front → time-sharded
    halo chain, composed under a single jit.  Must agree with running the
    two stages separately through the host (combine_harmonics envelope →
    sharded_reconstruct_fn): weights to 1e-3, image to ~0.2% (the sync
    stage's argmax quantises f32-reassociation-level envelope differences
    into sub-pixel shifts — the parity floor for argmax-bearing chains)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tempest_tpu.ops.scan import _channel_geometry
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import (
        sharded_combined_reconstruct_fn,
        sharded_reconstruct_fn,
    )

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    n_c = 1 << 21
    cap = tt.generate_iq_harmonics(MODE, fs, n_c, carriers,
                                   amplitudes=[1.0, 0.8], snr_db=8.0,
                                   seed=4)
    mesh = make_mesh(8)
    _, _, fs_chan = _channel_geometry(n_c, fs, 2e6)
    cfg = ReconstructionConfig(sample_rate=fs_chan, mode=MODE, n_frames=1,
                               input_format="envelope", align_subpixel=True)
    step = sharded_combined_reconstruct_fn(cfg, mesh, fs, n_c, carriers,
                                           60.0, chan_bw=2e6)
    words = jnp.asarray(cap.iq.view(np.float32))
    ema0 = jnp.zeros(cfg.render_size, jnp.float32)
    ema, frames, sync, score, w, pol = step(words, ema0, jnp.float32(0.5))
    assert frames.shape == (8, *cfg.render_size)

    fvq = fs_chan / round(fs_chan / 60.0)
    comb = tt.combine_harmonics(cap.iq, fs, carriers, chan_bw=2e6,
                                refresh_hz=fvq)
    np.testing.assert_allclose(np.asarray(w)[:2], comb.weights, atol=1e-3)
    S = step.shard_samples
    env_sh = jax.device_put(comb.envelope[: 8 * S].reshape(8, S),
                            NamedSharding(mesh, P("blocks", None)))
    chain = sharded_reconstruct_fn(cfg, mesh)
    ema_ref, *_ = chain(env_sh, ema0, jnp.float32(0.5))
    err = np.abs(np.asarray(ema) - np.asarray(ema_ref)).max()
    assert err < 5e-3 * np.abs(np.asarray(ema_ref)).max(), err


def test_excision_recovers_cw_hit_channel():
    """Spectral excision (excise_db=0.0): a CW interferer 9.5 dB above one
    channel's emission is nulled in the channel spectrum (only bins louder
    than the channel's own carrier peak + a leakage-skirt dilation — the
    emission's comb lines are all BELOW the carrier line, so the grid is
    protected by construction).  The hit channel's weight must recover to
    ~clean (measured 0.018 → 0.258 vs clean 0.279) and the fusion to the
    clean PSNR (13.48 vs clean 13.47; robust-MRC-only 13.19); a clean
    capture must pass through excision with IDENTICAL weights (no false
    nulls)."""
    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.55), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.7],
                                   snr_db=6.0, seed=5)
    truth = _truth(cap)
    n = len(cap.iq)
    cw = (3.0 * np.exp(2j * np.pi * 11.3e6 / FS * np.arange(n))
          ).astype(np.complex64)
    dirty = (cap.iq + cw).astype(np.complex64)
    c_clean = tt.combine_harmonics(cap.iq, FS, CARRIERS)
    c_clean_exc = tt.combine_harmonics(cap.iq, FS, CARRIERS, excise_db=0.0)
    np.testing.assert_allclose(c_clean_exc.weights, c_clean.weights,
                               atol=1e-6)
    _, r_exc, c_exc = combined_reconstruct(dirty, FS, CARRIERS, alpha=0.7,
                                           excise_db=0.0)
    np.testing.assert_allclose(c_exc.weights, c_clean.weights, atol=0.05)
    _, r_clean, _ = combined_reconstruct(cap.iq, FS, CARRIERS, alpha=0.7)
    p_exc, _ = aligned_psnr(truth, r_exc.image)
    p_clean, _ = aligned_psnr(truth, r_clean.image)
    assert p_exc > p_clean - 0.15, f"excised {p_exc:.2f}, clean {p_clean:.2f}"


def test_excision_never_nulls_carrier_near_dc():
    """A CW interferer within ``dilate_bins`` of the carrier bin must not
    null the channel's own carrier line: the box dilation used to swallow
    the protected DC guard bins, destroying the channel instead of
    recovering it (r4 advisor finding)."""
    from tempest_tpu.ops.scan import _excise_spikes

    m = 4096
    rng = np.random.default_rng(0)
    spec = (0.01 * (rng.normal(size=m) + 1j * rng.normal(size=m))
            ).astype(np.complex64)
    spec[0] = 10.0      # carrier line (strongest emission line)
    spec[100] = 300.0   # CW interferer, 100 < dilate_bins=256 from DC
    out = np.asarray(_excise_spikes(jnp.asarray(spec)[None, :], 0.0))[0]
    assert out[100] == 0.0, "interferer must be nulled"
    assert out[0] == spec[0], "carrier line must survive the dilation"
    assert out[1] == spec[1] and out[-1] == spec[-1], \
        "guard bins must survive the dilation"


def test_sharded_excision_matches_single_device():
    """The sharded combine's per-channel excision (inside the shard_map
    local) must match the single-device kernel on the CW-hit capture."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics

    cap = tt.generate_iq_harmonics(MODE, FS, int(FS * 0.3), CARRIERS,
                                   amplitudes=[1.0, 0.7, 0.7],
                                   snr_db=6.0, seed=5)
    n = len(cap.iq)
    cw = (3.0 * np.exp(2j * np.pi * 11.3e6 / FS * np.arange(n))
          ).astype(np.complex64)
    dirty = (cap.iq + cw).astype(np.complex64)
    ref = tt.combine_harmonics(dirty, FS, CARRIERS, excise_db=0.0)
    sh = sharded_combine_harmonics(dirty, FS, CARRIERS, make_mesh(8),
                                   excise_db=0.0)
    np.testing.assert_array_equal(ref.polarity, sh.polarity)
    np.testing.assert_allclose(ref.weights, sh.weights, rtol=1e-5)
    scale = np.abs(ref.envelope).max()
    np.testing.assert_allclose(sh.envelope, ref.envelope, atol=1e-5 * scale)


def _fm_cap(snr_db=2.0, n_frac=0.55):
    """FM-leakage fixture: three equal-strength carriers, the video riding
    in each carrier's FREQUENCY (1.2 MHz peak deviation, inside the 4 MHz
    channels), the third with inverted deviation."""
    return tt.generate_iq_harmonics(
        MODE, FS, int(FS * n_frac), CARRIERS, snr_db=snr_db,
        amplitudes=[1.0, 1.0, 1.0], depths=[0.8, 0.8, -0.8],
        modulation="fm", deviation_hz=1.2e6, seed=3)


def test_fm_harmonic_combining_beats_single():
    """FM leakage (video in carrier frequency, constant amplitude): the
    per-channel discriminator front (demod="fm") must fuse the three
    carriers into a better image than the best single one (measured +0.98
    dB at 2 dB SNR; +0.21 at 10 where the chain's ceiling compresses), flip
    the inverted-deviation carrier, and re-base the output polarity to the
    FIRST carrier — with equal masses the anchor draw is arbitrary, and an
    inverted anchor measurably cost 8 dB before the re-basing."""
    cap = _fm_cap(snr_db=2.0)
    truth = _truth(cap)
    t1, r1, _ = combined_reconstruct(cap.iq, FS, [CARRIERS[0]], alpha=0.3,
                                     demod="fm")
    t3, r3, c3 = combined_reconstruct(cap.iq, FS, CARRIERS, alpha=0.3,
                                      demod="fm")
    assert t3.mode_name == "640x480 @ 60Hz"
    np.testing.assert_array_equal(c3.polarity, [1.0, 1.0, -1.0])
    p1, _ = aligned_psnr(truth, r1.image)
    p3, _ = aligned_psnr(truth, r3.image)
    assert p3 > p1 + 0.5, f"single {p1:.2f}, fused {p3:.2f}"
    assert min(c3.weights) > 0.25  # equal-strength carriers, balanced MRC


def test_fm_scan_detects_fm_emission():
    """The FM band sweep (scan_band(demod="fm")) must detect an FM emission
    over its own measured discriminator noise floor, with the right refresh.
    (The AM statistic is NOT asserted blind: brick-wall channel edges
    convert FM sidebands to AM, so it sees *something* — the FM statistic
    is the honest detector for constant-amplitude carriers.)"""
    from tempest_tpu.ops.scan import scan_band, scan_centers

    cap = _fm_cap(snr_db=10.0, n_frac=0.3)
    centers = scan_centers(FS, step_hz=2e6, guard_hz=2e6)
    res = scan_band(cap.iq, FS, centers, corr_seconds=0.1, demod="fm")
    ems = res.emissions(min_margin_db=5.0)
    assert ems, "FM sweep detected nothing"
    assert abs(ems[0]["refresh_hz"] - 60.0) < 0.05
    # The discriminator null's floor is measured, not inherited from AM.
    assert 2.0 < res.floor_db[0] < 14.0


def test_fm_excise_refused_everywhere():
    """excise_db + demod='fm' is unsound (wideband FM nulls its own carrier
    at J0 zeros, so 'louder than the carrier' stops meaning interference) —
    every public combine entry refuses it loudly instead of silently
    excising the emission."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics
    from tempest_tpu.runtime.sources import SyntheticSource
    from tempest_tpu.runtime.stream import StreamingRuntime

    cap = _fm_cap(snr_db=10.0, n_frac=0.15)
    with pytest.raises(ValueError, match="excise_db with demod='fm'"):
        tt.combine_harmonics(cap.iq, FS, CARRIERS, demod="fm",
                             excise_db=0.0)
    with pytest.raises(ValueError, match="excise_db with demod='fm'"):
        sharded_combine_harmonics(cap.iq, FS, CARRIERS, make_mesh(8),
                                  demod="fm", excise_db=0.0)
    src = SyntheticSource(MODE, FS, int(FS * 0.3), snr_db=20.0, seed=0)
    with pytest.raises(ValueError, match="excise_db with demod='fm'"):
        StreamingRuntime(src, MODE, combine=list(CARRIERS),
                         combine_demod="fm", combine_excise_db=0.0)


def test_sharded_fm_combine_matches_single_device():
    """Channel-sharded FM combining must match the single-device kernel
    (same demod="fm" discriminator inside the shard_map local)."""
    from tempest_tpu.parallel.mesh import make_mesh
    from tempest_tpu.parallel.sharded import sharded_combine_harmonics

    cap = _fm_cap(snr_db=6.0, n_frac=0.3)
    ref = tt.combine_harmonics(cap.iq, FS, CARRIERS, demod="fm")
    sh = sharded_combine_harmonics(cap.iq, FS, CARRIERS, make_mesh(8),
                                   demod="fm")
    np.testing.assert_array_equal(ref.polarity, sh.polarity)
    # The discriminator's atan2 makes the mass dots reassociation-sensitive
    # (measured 7e-8 relative on the 8-device mesh) — near-exact, not exact
    # like the AM path's plain envelope dots.
    np.testing.assert_allclose(ref.mass_db, sh.mass_db, rtol=1e-6)
    np.testing.assert_allclose(ref.weights, sh.weights, rtol=1e-5)
    scale = np.abs(ref.envelope).max()
    np.testing.assert_allclose(sh.envelope, ref.envelope, atol=1e-5 * scale)


def test_streaming_combine_fm(tmp_path):
    """Live FM combining: the runtime's front discriminates every channel
    per block (combine_demod="fm") and the fused stream must beat the
    single carrier, carrying polarity/weights through health()."""
    from tempest_tpu.io.dat import write_complex_binary

    fs = 8e6
    carriers = [-2.4e6, 1.8e6]
    cap = tt.generate_iq_harmonics(MODE, fs, int(fs * 1.3), carriers,
                                   amplitudes=[1.0, 1.0],
                                   depths=[0.8, -0.8], snr_db=2.0,
                                   modulation="fm", deviation_hz=0.6e6,
                                   seed=4)
    path = tmp_path / "hfm.dat"
    write_complex_binary(cap.iq, str(path), "single")
    truth = _truth(cap)
    img1, _ = _stream_ema(path, fs, MODE, [carriers[0]], alpha=0.7,
                          demod="fm")
    img2, rt = _stream_ema(path, fs, MODE, carriers, alpha=0.7, demod="fm")
    p1, _ = aligned_psnr(truth, img1)
    p2, _ = aligned_psnr(truth, img2)
    assert p2 > p1 + 0.2, f"single {p1:.2f}, fused {p2:.2f}"
    info = rt.health()["combine"]
    assert info["demod"] == "fm"
    w = info["weights"]
    assert min(w) > 0.3, w


def test_cli_synth_fm_harmonics_combine(tmp_path, capsys):
    """CLI surface: synth --modulation fm writes an FM multi-carrier
    capture that reconstruct --combine --combine-demod fm fuses."""
    from tempest_tpu.app.cli import main as cli_main

    cap = tmp_path / "hfm.dat"
    out = tmp_path / "cfm.png"
    assert cli_main([
        "synth", "--mode", "640x480 @ 60Hz", "--fs", str(FS),
        "--seconds", "0.3", "--snr", "10",
        "--harmonics=-8e6,2.5e6,11e6", "--modulation", "fm",
        "--deviation", "1.2e6", "--out", str(cap),
    ]) == 0
    assert cli_main([
        "reconstruct", str(cap), "--fs", str(FS), "--alpha", "0.5",
        "--combine=-8e6,2.5e6,11e6", "--combine-demod", "fm",
        "--out", str(out),
    ]) == 0
    text = capsys.readouterr().out
    assert "640x480 @ 60Hz" in text
    assert text.count("  carrier ") == 3
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_envelope_input_format_matches_complex():
    """input_format='envelope' with a host-demodulated |iq| must reproduce
    the complex-input chain (demod there is the same abs)."""
    fs = 4e6
    cap = tt.generate_iq(MODE, fs, int(fs * 0.3), snr_db=20.0, seed=3)
    n_frames = 16
    cfg_c = ReconstructionConfig(sample_rate=fs, mode=MODE,
                                 n_frames=n_frames, align_subpixel=True)
    cfg_e = ReconstructionConfig(sample_rate=fs, mode=MODE,
                                 n_frames=n_frames, align_subpixel=True,
                                 input_format="envelope")
    r_c = reconstruct_frames(cap.iq, cfg_c, alpha=0.6)
    env = np.abs(cap.iq).astype(np.float32)
    r_e = reconstruct_frames(env, cfg_e, alpha=0.6)
    np.testing.assert_allclose(r_e.image, r_c.image, rtol=2e-4, atol=2e-5)
