"""MTF restoration (ops.enhance): kernel transfer functions and measured
PSNR gains of the Wiener deconvolution on reconstructed screens."""

import numpy as np
import jax.numpy as jnp

import tempest_tpu as tt
from tempest_tpu.ops.enhance import interp_kernel_ft, restore_image, wiener_gain
from tempest_tpu.ops.resample import downgrade_image
from tempest_tpu.pipeline.offline import (
    ReconstructionConfig,
    auto_reconstruct,
    reconstruct_frames,
)
from tempest_tpu.render.screen import aligned_psnr

MODE = tt.ALL_VIDEO_MODES["640x480 @ 60Hz"]
FS = 4e6


def test_linear_kernel_ft_is_sinc_squared():
    u = np.linspace(0.0, 0.5, 33)
    K = interp_kernel_ft("linear", u)
    assert np.abs(K - np.sinc(u) ** 2).max() < 1e-3


def test_kernel_ft_dc_is_unity():
    for interp in ("linear", "cubic"):
        K = interp_kernel_ft(interp, np.zeros(1))
        assert abs(K[0] - 1.0) < 1e-6, interp


def test_wiener_gain_identity_without_kernels():
    g = wiener_gain(64, (), nsr=0.002)
    assert np.all(g == 1.0)


def test_wiener_gain_boosts_high_frequencies():
    g = wiener_gain(800, ((6.3, "linear"),), nsr=0.002)
    assert g[0] < 1.01           # DC passes through (H=1 there)
    assert g.max() > 2.0         # attenuated bands are boosted
    assert np.isfinite(g).all()


def test_restore_improves_deep_average_psnr():
    """The shipped claim: Wiener-inverting the known sampling MTF gains
    >0.8 dB on a deep subpixel-registered average (measured +1.2)."""
    cap = tt.generate_iq(MODE, FS, int(FS * 0.8), snr_db=30.0, seed=3)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    cfg = ReconstructionConfig(sample_rate=FS, mode=MODE, n_frames=47,
                               align_subpixel=True)
    rec = reconstruct_frames(cap.iq, cfg, alpha=0.9)
    p_base, _ = aligned_psnr(truth, rec.image)
    restored = restore_image(rec.image, cfg)
    p_rest, _ = aligned_psnr(truth, restored)
    assert p_rest > p_base + 0.8, f"{p_base:.2f} -> {p_rest:.2f}"
    # Clipping invariant: restoration cannot exceed the raw image's range.
    assert restored.min() >= rec.image.min() - 1e-5
    assert restored.max() <= rec.image.max() + 1e-5


def test_auto_reconstruct_restores_by_default():
    cap = tt.generate_iq(MODE, FS, int(FS * 0.5), snr_db=18.0, seed=3)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    timing, rec = auto_reconstruct(cap.iq, FS, alpha=0.6)
    assert rec.image_raw is not None
    p_raw, _ = aligned_psnr(truth, rec.image_raw)
    p_res, _ = aligned_psnr(truth, rec.image)
    assert p_res > p_raw, f"restore hurt: {p_raw:.2f} -> {p_res:.2f}"
    _, rec_off = auto_reconstruct(cap.iq, FS, alpha=0.6, restore=False)
    assert rec_off.image_raw is None
    np.testing.assert_allclose(rec_off.image, rec.image_raw, rtol=1e-6)


def test_restore_never_harms_low_snr():
    """At 10 dB SNR noise dominates blur; the default nsr must stay neutral
    (measured +0.0-0.1 dB), not amplify noise."""
    cap = tt.generate_iq(MODE, FS, int(FS * 0.5), snr_db=10.0, seed=9)
    truth = np.asarray(downgrade_image(jnp.asarray(cap.frame)))
    cfg = ReconstructionConfig(sample_rate=FS, mode=MODE, n_frames=29,
                               align_subpixel=True)
    rec = reconstruct_frames(cap.iq, cfg, alpha=0.5)
    p_base, _ = aligned_psnr(truth, rec.image)
    p_rest, _ = aligned_psnr(truth, restore_image(rec.image, cfg))
    assert p_rest > p_base - 0.25, f"{p_base:.2f} -> {p_rest:.2f}"
