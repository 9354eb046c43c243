"""Tests for .dat I/O and the synthetic TEMPEST generator.

Mirrors the reference's round-trip property test
(``/root/reference/test/runtests.jl:4-26``) and adds generator ground-truth
checks the reference never had (SURVEY.md §4).
"""

import numpy as np
import pytest

from tempest_tpu.io.dat import (
    read_complex_binary,
    write_complex_binary,
    iter_complex_blocks,
    num_samples,
)
from tempest_tpu.io.synthetic import generate_iq, render_frame
from tempest_tpu.io.synthetic import test_pattern as make_test_pattern
from tempest_tpu.video.modes import ALL_VIDEO_MODES


@pytest.mark.parametrize("fmt,tol", [("single", 1e-6), ("double", 1e-6)])
def test_dat_roundtrip_float(tmp_path, fmt, tol):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
        np.complex64
    )
    path = tmp_path / f"roundtrip_{fmt}.dat"
    write_complex_binary(x, path, fmt)
    y = read_complex_binary(path, fmt)
    assert y.dtype == np.complex64
    np.testing.assert_allclose(y, x, atol=tol)


def test_dat_roundtrip_short(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.random(2048) + 1j * rng.random(2048)).astype(np.complex64)
    path = tmp_path / "roundtrip_short.dat"
    write_complex_binary(x, path, "short")
    y = read_complex_binary(path, "short")
    # Short format rescales each component by its max * 2^14.
    scale_re = (1 << 14) / np.max(x.real)
    scale_im = (1 << 14) / np.max(x.imag)
    np.testing.assert_allclose(y.real, np.round(x.real * scale_re), atol=0.5)
    np.testing.assert_allclose(y.imag, np.round(x.imag * scale_im), atol=0.5)


def test_dat_count_offset(tmp_path):
    x = np.arange(100, dtype=np.complex64) + 1j
    path = tmp_path / "co.dat"
    write_complex_binary(x, path)
    assert num_samples(path) == 100
    y = read_complex_binary(path, count=10, offset=5)
    np.testing.assert_allclose(y, x[5:15])


def test_iter_blocks_wraps(tmp_path):
    x = np.arange(64, dtype=np.complex64)
    path = tmp_path / "blocks.dat"
    write_complex_binary(x, path)
    it = iter_complex_blocks(path, 16, loop=True)
    blocks = [next(it) for _ in range(6)]
    np.testing.assert_allclose(blocks[0], x[:16])
    np.testing.assert_allclose(blocks[3], x[48:])
    np.testing.assert_allclose(blocks[4], x[:16])  # wrapped


def test_test_pattern_deterministic():
    a = make_test_pattern(120, 160, seed=3)
    b = make_test_pattern(120, 160, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_render_frame_blanking():
    mode = ALL_VIDEO_MODES["1024x768 @ 60Hz"]
    frame = render_frame(mode)
    assert frame.shape == (mode.height, mode.width)
    # Blanking margins are held at blank level.
    assert np.all(frame[:, -10:] == 0.0)
    assert np.all(frame[-10:, :] == 0.0)
    assert frame.max() > 0.5


def test_generate_iq_envelope_matches_raster():
    """The AM envelope of a noiseless capture must reproduce the raster."""
    mode = ALL_VIDEO_MODES["640x480 @ 60Hz"]  # 800x525 total
    fs = 8e6
    cap = generate_iq(mode, fs, 100_000, snr_db=200.0, seed=5)
    env = np.abs(cap.iq)
    # Reconstruct expected envelope directly.
    raster = cap.frame.ravel()
    step = mode.pixel_clock / fs
    idx = (cap.start_phase + step * np.arange(100_000)) % raster.size
    i0 = idx.astype(np.int64)
    frac = idx - i0
    i1 = (i0 + 1) % raster.size
    expected = 1.0 + 0.8 * (raster[i0] * (1 - frac) + raster[i1] * frac)
    np.testing.assert_allclose(env, expected, rtol=2e-4, atol=2e-4)


def test_generate_iq_snr():
    mode = ALL_VIDEO_MODES["640x480 @ 60Hz"]
    cap = generate_iq(mode, 8e6, 200_000, snr_db=10.0, seed=6)
    clean = generate_iq(mode, 8e6, 200_000, snr_db=300.0, seed=6)
    noise = cap.iq - clean.iq
    snr = 10 * np.log10(np.mean(np.abs(clean.iq) ** 2) / np.mean(np.abs(noise) ** 2))
    assert abs(snr - 10.0) < 0.5
