"""Property-based tests (Hypothesis): invariants that must hold for *any*
input, complementing the example-based suites (SURVEY.md §4 pyramid)."""

import numpy as np
from hypothesis import given, settings, strategies as st

import tempest_tpu as tt
from tempest_tpu.video.modes import ALL_VIDEO_MODES, find_closest_mode


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2048),
    fmt=st.sampled_from(["single", "double"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_dat_roundtrip_any_length(tmp_path_factory, n, fmt, seed):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    path = tmp_path_factory.mktemp("dat") / "x.dat"
    tt.write_complex_binary(x, path, fmt)
    y = tt.read_complex_binary(path, fmt)
    assert y.dtype == np.complex64
    np.testing.assert_allclose(y, x, atol=1e-6)


@settings(max_examples=50, deadline=None)
@given(
    y_t=st.floats(min_value=200, max_value=2600),
    refresh=st.floats(min_value=20, max_value=130),
)
def test_mode_lookup_total_and_consistent(y_t, refresh):
    """Lookup never fails, snaps the refresh to a table rate, and returns the
    height-closest mode at that rate."""
    name, mode = find_closest_mode(y_t, refresh)
    assert name in ALL_VIDEO_MODES
    same_rate = [m for m in ALL_VIDEO_MODES.values() if m.refresh == mode.refresh]
    best = min(abs(m.height - y_t) for m in same_rate)
    assert abs(mode.height - y_t) == best


@settings(max_examples=20, deadline=None)
@given(
    n_in=st.integers(min_value=16, max_value=5000),
    n_out=st.integers(min_value=2, max_value=4000),
)
def test_linear_resample_bounds_and_shape(n_in, n_out):
    """Linear interpolation never extrapolates beyond the input range."""
    import jax.numpy as jnp

    from tempest_tpu.ops.resample import linear_resample

    rng = np.random.default_rng(n_in * 7919 + n_out)
    x = rng.standard_normal(n_in).astype(np.float32)
    y = np.asarray(linear_resample(jnp.asarray(x), n_out))
    assert y.shape == (n_out,)
    assert y.min() >= x.min() - 1e-5
    assert y.max() <= x.max() + 1e-5


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=64, max_value=4096),
    max_delay_frac=st.floats(min_value=0.05, max_value=2.0),
)
def test_autocorrelation_shapes_consistent(n, max_delay_frac):
    """gamma and lags always have equal length, even for short signals."""
    import jax.numpy as jnp

    from tempest_tpu.ops.autocorr import autocorrelation

    fs = 1e4
    max_delay = max_delay_frac * n / fs
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32)
    gamma, lags = autocorrelation(jnp.asarray(x), fs, 0.0, max_delay)
    assert gamma.shape == lags.shape
    assert gamma.shape[0] >= 1
