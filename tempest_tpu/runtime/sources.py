"""IQ sample sources: file replay, live synthesis, and hardware SDR stubs.

The acquisition layer of the framework — the role AbstractSDRs.jl plays for
the reference (``/root/reference/src/AtomicAbstractSDRs.jl:273-306``).  All
sources produce fixed-size complex64 blocks through a uniform interface so the
streaming runtime can swap them freely:

* ``ReplaySource`` — loops a recorded ``.dat`` capture, the reference's
  ``:radiosim`` backend (``GUI.jl:365-373,677-692``).
* ``SyntheticSource`` — streams the synthetic TEMPEST generator continuously
  (no reference equivalent; replaces the missing golden capture).
* ``HardwareSource`` — driver boundary for real SDRs (UHD/USRP, AdalmPluto,
  BladeRF, RTL-SDR — the reference's supported set, ``Project.toml:6-19``).
  This build environment has no SDR driver stack, so instantiation raises
  with guidance; the class documents the integration surface (SoapySDR-style
  ``readStream`` into the block buffer).
"""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np

from ..io.dat import iter_complex_blocks
from ..io.synthetic import generate_iq
from ..video.modes import VideoMode

__all__ = ["SampleSource", "ReplaySource", "SyntheticSource", "HardwareSource", "open_source"]


class SampleSource(Protocol):
    """Uniform block source: fills caller-provided complex64 blocks."""

    sample_rate: float
    block_size: int

    def read(self, out: np.ndarray) -> None: ...
    def close(self) -> None: ...


class ReplaySource:
    """Loop a recorded interleaved-IQ capture as if it were live hardware."""

    def __init__(
        self,
        path: str | os.PathLike,
        sample_rate: float,
        block_size: int,
        fmt: str = "single",
    ) -> None:
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self._iter = iter_complex_blocks(path, self.block_size, fmt, loop=True)

    def read(self, out: np.ndarray) -> None:
        np.copyto(out, next(self._iter))

    def close(self) -> None:
        self._iter = iter(())


class SyntheticSource:
    """Stream a synthetic screen emanation block by block, phase-continuous
    across blocks (the generator carries the raster phase)."""

    def __init__(
        self,
        mode: VideoMode,
        sample_rate: float,
        block_size: int,
        snr_db: float = 20.0,
        seed: int = 0,
        visible: np.ndarray | None = None,
    ) -> None:
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.mode = mode
        self._snr = snr_db
        self._seed = seed
        self._visible = visible
        self._phase = 0.0
        self._pix_per_sample = mode.pixel_clock / sample_rate
        self._block_idx = 0

    def read(self, out: np.ndarray) -> None:
        cap = generate_iq(
            self.mode,
            self.sample_rate,
            self.block_size,
            visible=self._visible,
            snr_db=self._snr,
            start_phase=self._phase,
            seed=self._seed + self._block_idx,
        )
        np.copyto(out, cap.iq)
        n_pix = self.mode.pixels_per_frame
        self._phase = (self._phase + self._pix_per_sample * self.block_size) % n_pix
        self._block_idx += 1

    def close(self) -> None:
        pass


class HardwareSource:
    """Driver boundary for live SDR hardware.

    Integration contract (what a deployment implements): open the device at
    (carrier_freq, sample_rate, gain), then ``read`` fills each block from the
    driver's stream API; ``close`` releases the device.  Matches the
    reference's driver surface — ``openSDR``/``recv!``/``updateCarrierFreq!``/
    ``updateSamplingRate!``/``updateGain!`` (``AtomicAbstractSDRs.jl:273-306``,
    ``GUI.jl:609-658``).
    """

    SUPPORTED = ("uhd", "pluto", "bladerf", "rtlsdr")

    def __init__(
        self,
        backend: str,
        carrier_freq: float,
        sample_rate: float,
        gain: float,
        block_size: int,
    ) -> None:
        raise RuntimeError(
            f"No SDR driver stack is available in this environment "
            f"(requested backend {backend!r}; supported: {self.SUPPORTED}). "
            f"Use ReplaySource for recorded captures or SyntheticSource for "
            f"generated signal."
        )


def open_source(
    kind: str,
    *,
    sample_rate: float,
    block_size: int,
    path: str | None = None,
    mode: VideoMode | None = None,
    carrier_freq: float = 764e6,
    gain: float = 50.0,
    fmt: str = "single",
    snr_db: float = 20.0,
    seed: int = 0,
) -> SampleSource:
    """Factory mirroring the reference's sdr-symbol dispatch
    (``GUI.jl:667-695``): ``radiosim``→ReplaySource, ``synthetic``→generator,
    hardware names→HardwareSource."""
    if kind in ("radiosim", "replay", "file"):
        if path is None:
            raise ValueError("replay source needs path=")
        return ReplaySource(path, sample_rate, block_size, fmt)
    if kind == "synthetic":
        if mode is None:
            raise ValueError("synthetic source needs mode=")
        return SyntheticSource(mode, sample_rate, block_size, snr_db=snr_db, seed=seed)
    return HardwareSource(kind, carrier_freq, sample_rate, gain, block_size)
