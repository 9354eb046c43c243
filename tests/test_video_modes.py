"""Tests for the video-mode database and nearest-mode lookup.

Extends the reference's smoke tests (``/root/reference/test/runtests.jl:29-51``)
into real assertions: every known mode must be recovered by the nearest-mode
search from its own (height, refresh) and from slightly perturbed heights.
"""

import numpy as np

from tempest_tpu.video.modes import (
    ALL_VIDEO_MODES,
    VideoMode,
    candidate_modes,
    find_closest_mode,
    find_configuration,
    get_refresh_rates,
    mode_table_arrays,
)


def test_table_size_and_types():
    assert len(ALL_VIDEO_MODES) >= 10  # reference asserts ≥10; we ship 80
    assert len(ALL_VIDEO_MODES) == 80
    for name, mode in ALL_VIDEO_MODES.items():
        assert isinstance(name, str)
        assert mode.width > 0 and mode.height > 0 and mode.refresh > 0


def test_self_consistency_exact():
    """find_closest_mode(height, refresh) must return a mode with that exact
    height at that refresh (the reference computed this but forgot to assert,
    runtests.jl:45)."""
    for mode in ALL_VIDEO_MODES.values():
        _, got = find_closest_mode(mode.height, mode.refresh)
        assert got.refresh == mode.refresh
        assert got.height == mode.height


def test_self_consistency_perturbed():
    """A height off by +2 still snaps to a nearby mode at the same rate."""
    for mode in ALL_VIDEO_MODES.values():
        _, got = find_closest_mode(mode.height + 2, mode.refresh)
        assert got.refresh == mode.refresh
        assert abs(got.height - mode.height) <= 4


def test_refresh_snapping():
    # 60.07 Hz estimate should use the 60 Hz family.
    _, got = find_closest_mode(1125, 60.07)
    assert got == ALL_VIDEO_MODES["1920x1080 @ 60Hz"]


def test_find_configuration_inverse():
    assert find_configuration(VideoMode(2592, 1242, 60.0)) == "1920x1200 @ 60Hz"
    assert find_configuration(VideoMode(1, 2, 3.0)) is None


def test_mode_table_arrays_align():
    w, h, r = mode_table_arrays()
    assert w.shape == h.shape == r.shape == (len(ALL_VIDEO_MODES),)
    modes = list(ALL_VIDEO_MODES.values())
    i = np.random.default_rng(0).integers(0, len(modes))
    assert modes[i].width == w[i] and modes[i].height == h[i]


def test_candidate_modes():
    cands = candidate_modes(60.0, tol_hz=0.5)
    assert all(m.refresh == 60.0 for _, m in cands)
    assert ("1920x1080 @ 60Hz", ALL_VIDEO_MODES["1920x1080 @ 60Hz"]) in cands


def test_refresh_rates_unique():
    rates = get_refresh_rates()
    assert len(rates) == len(set(rates))
    assert 60.0 in rates and 75.0 in rates
