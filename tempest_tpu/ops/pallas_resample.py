"""Pallas TPU kernel: fused scanline resampling (signal → screen).

The signal→screen mapping (see ``ops/resample.py``) reads, for every output
row, a short contiguous span of the envelope and interpolates it at affine
positions ``frac + c·delta``.  The XLA formulations express the interpolation
as gathers; this Pallas kernel instead:

* tiles the output over (row-tile) grid steps, 8 rows per step (f32 sublane);
* for each of the tile's 16 scanline spans (8 rows × 2 vertical taps), copies
  ``span_pad`` envelope samples HBM→VMEM with explicit async DMA, double-
  buffer style;
* builds the (span_pad × w_out) linear-interpolation weight matrix *in VMEM*
  from ``broadcasted_iota`` (``W[i,c] = max(0, 1 - |i - (frac + c·delta)|)``)
  — the one-hot-matmul trick: interpolation as MXU work, no gathers, no
  multi-MB weight constants in HBM;
* contracts span @ W on the MXU and accumulates the two vertical taps with
  their bilinear weights.

Geometry (span starts, fracs, vertical weights) is precomputed host-side per
``(n_in, y_t, x_t, out_shape)`` — identical to ``_screen_geometry`` — and fed
as scalar-prefetch arrays so DMA addresses are known before the kernel body
runs (``PrefetchScalarGridSpec``).

Runs compiled on TPU; ``interpret=True`` (used on CPU in tests) validates
numerics against the XLA ``frame_to_screen`` reference path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample import RENDER_SIZE, _screen_geometry

__all__ = ["frame_to_screen_pallas"]

_ROWS_PER_TILE = 8


def _kernel(start_ref, frac_ref, wr_ref, sig_ref, out_ref, span_buf, sem,
            *, span_pad: int, w_out: int, delta: float):
    tile = pl.program_id(0)
    base = tile * _ROWS_PER_TILE

    # DMA all 16 spans of this tile (8 rows x 2 vertical taps) HBM -> VMEM.
    for i in range(_ROWS_PER_TILE):
        for t in range(2):
            line = 2 * (base + i) + t
            dma = pltpu.make_async_copy(
                sig_ref.at[pl.ds(start_ref[line], span_pad)],
                span_buf.at[2 * i + t],
                sem.at[2 * i + t],
            )
            dma.start()

    # Interpolation positions shared by all rows up to the per-line frac:
    # pos[c] = frac + c*delta; weight W[s, c] = max(0, 1 - |s - pos[c]|).
    s_idx = jax.lax.broadcasted_iota(jnp.float32, (span_pad, w_out), 0)
    c_pos = jax.lax.broadcasted_iota(jnp.float32, (span_pad, w_out), 1) * delta

    for i in range(_ROWS_PER_TILE):
        line_t = 2 * (base + i)
        for t in range(2):
            pltpu.make_async_copy(
                sig_ref.at[pl.ds(start_ref[line_t + t], span_pad)],
                span_buf.at[2 * i + t],
                sem.at[2 * i + t],
            ).wait()
        w_r = wr_ref[base + i]
        f_top = frac_ref[line_t]
        f_bot = frac_ref[line_t + 1]
        # Lower-clip positions to 0 (the upper end is edge-padded) — the same
        # boundary behaviour as the XLA reference path.
        pos_top = jnp.maximum(c_pos + f_top, 0.0)
        pos_bot = jnp.maximum(c_pos + f_bot, 0.0)
        w_top = jnp.maximum(0.0, 1.0 - jnp.abs(s_idx - pos_top))
        w_bot = jnp.maximum(0.0, 1.0 - jnp.abs(s_idx - pos_bot))
        top = jax.lax.dot_general(
            span_buf[2 * i][None, :], w_top,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bot = jax.lax.dot_general(
            span_buf[2 * i + 1][None, :], w_bot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[i, :] = ((1.0 - w_r) * top + w_r * bot)[0]


@functools.partial(
    jax.jit, static_argnames=("y_t", "x_t", "out_shape", "interpret")
)
def frame_to_screen_pallas(
    sig: jnp.ndarray,
    y_t: int,
    x_t: int,
    out_shape: tuple[int, int] = RENDER_SIZE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-fused equivalent of ``frame_to_screen`` (same geometry/clipping
    as ``frame_to_screen_rows`` up to float rounding)."""
    n_in = sig.shape[0]
    h_out, w_out = out_shape
    if h_out % _ROWS_PER_TILE:
        raise ValueError(f"output height must be a multiple of {_ROWS_PER_TILE}")
    start, frac, wr, cols, ratio = _screen_geometry(n_in, y_t, x_t, out_shape)
    delta = float(cols[1]) if w_out > 1 else 0.0
    span = int(np.ceil(cols[-1] + 1)) + 2
    span_pad = -(-span // 128) * 128

    # Edge-pad so spans never clamp at the end; a negative start (row 0 only)
    # is clamped to 0 with the shift folded into frac — the triangular weights
    # evaluate negative positions as partial weight on sample 0, matching the
    # reference path's edge clip to within one tap.
    raw_start = start.reshape(-1)
    flat_start = np.maximum(raw_start, 0).astype(np.int32)
    flat_frac = (
        frac.reshape(-1) + (raw_start - flat_start)
    ).astype(np.float32)
    sig_pad = jnp.concatenate(
        [sig.astype(jnp.float32), jnp.broadcast_to(sig[-1], (span_pad,)).astype(jnp.float32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # starts, fracs, wr
        grid=(h_out // _ROWS_PER_TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_ROWS_PER_TILE, w_out),
            lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * _ROWS_PER_TILE, span_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * _ROWS_PER_TILE,)),
        ],
    )
    kernel = functools.partial(
        _kernel, span_pad=span_pad, w_out=w_out, delta=delta
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h_out, w_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(flat_start),
        jnp.asarray(flat_frac),
        jnp.asarray(wr[:, 0]),
        sig_pad,
    )
