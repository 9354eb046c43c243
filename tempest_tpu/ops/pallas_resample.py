"""Pallas TPU kernel: fused multi-frame scanline resampling (signal → screens).

The signal→screen mapping (see ``ops/resample.py``) reads, for every output
row, a short contiguous span of the envelope and interpolates it at affine
positions ``frac + c·delta``.  The XLA formulations express the interpolation
as gathers or one batched einsum; this Pallas kernel instead:

* runs a grid over (frame, 8-row tile) — all frames of a block in ONE
  pallas_call, no vmap (the TPU lowering rejects batched ``ANY``-space
  operands, so the frame axis lives in the grid);
* per tile, copies the 16 scanline spans (8 rows × 2 vertical taps)
  HBM→VMEM with explicit async DMA;
* builds the (span_pad × w_out) linear-interpolation weight matrix *in VMEM*
  from ``broadcasted_iota`` (``W[i,c] = max(0, 1 - |i - pos(c)|)``) — the
  one-hot-matmul trick: interpolation as MXU work, no gathers and no
  multi-MB weight constants streaming from HBM;
* contracts span @ W on the MXU and blends the two vertical taps.

Line geometry is precomputed host-side (shared ``_screen_geometry``); the
per-line span starts arrive as scalar-prefetch arrays so DMA addresses are
known before the body runs, and *traced* frame starts (streaming phase carry)
are supported — they just add to the prefetch array.

Compiled on TPU; ``interpret=True`` (CPU tests) matches the XLA reference
path to float rounding.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample import RENDER_SIZE, _screen_geometry

__all__ = ["frames_to_screens_pallas", "frame_to_screen_pallas"]

_ROWS_PER_TILE = 8


def _kernel(start_ref, frac_ref, wr_ref, sig_ref, out_ref, span_buf, sem,
            *, span_pad: int, w_out: int, delta: float, h_out: int):
    frame = pl.program_id(0)
    tile = pl.program_id(1)
    base = tile * _ROWS_PER_TILE          # first output row of this tile
    lbase = frame * 2 * h_out + 2 * base  # first line index in prefetch arrays

    # Start all 16 span DMAs (HBM -> VMEM) up front.
    for i in range(2 * _ROWS_PER_TILE):
        pltpu.make_async_copy(
            sig_ref.at[0, pl.ds(start_ref[lbase + i], span_pad)],
            span_buf.at[i],
            sem.at[i],
        ).start()

    # Mosaic requires integer iota; cast to f32 afterwards.
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (span_pad, w_out), 0).astype(
        jnp.float32
    )
    c_pos = jax.lax.broadcasted_iota(jnp.int32, (span_pad, w_out), 1).astype(
        jnp.float32
    ) * delta

    for i in range(_ROWS_PER_TILE):
        for t in range(2):
            pltpu.make_async_copy(
                sig_ref.at[0, pl.ds(start_ref[lbase + 2 * i + t], span_pad)],
                span_buf.at[2 * i + t],
                sem.at[2 * i + t],
            ).wait()
        w_r = wr_ref[base + i].astype(jnp.float32) / 65536.0
        f_top = frac_ref[lbase + 2 * i].astype(jnp.float32) / 65536.0
        f_bot = frac_ref[lbase + 2 * i + 1].astype(jnp.float32) / 65536.0
        # Lower-clip positions to 0 (upper end is edge-padded) — the same
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
        out_ref[0, i, :] = ((1.0 - w_r) * top + w_r * bot)[0]


def _kernel_vmem(start_ref, frac_ref, wr_ref, sig_ref, out_ref,
                 *, span_pad: int, w_out: int, delta: float, h_out: int):
    """DMA-free variant: the whole envelope block lives in VMEM; spans are
    direct dynamic slices.  Simpler lowering (no semaphores), used when the
    block fits the VMEM budget."""
    frame = pl.program_id(0)
    tile = pl.program_id(1)
    base = tile * _ROWS_PER_TILE
    lbase = frame * 2 * h_out + 2 * base

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (span_pad, w_out), 0).astype(
        jnp.float32
    )
    c_pos = jax.lax.broadcasted_iota(jnp.int32, (span_pad, w_out), 1).astype(
        jnp.float32
    ) * delta

    for i in range(_ROWS_PER_TILE):
        # Scalar-prefetch arrays are int32 (Mosaic requirement); fracs and
        # vertical weights travel as 16.16 fixed point.
        w_r = wr_ref[base + i].astype(jnp.float32) / 65536.0
        f_top = frac_ref[lbase + 2 * i].astype(jnp.float32) / 65536.0
        f_bot = frac_ref[lbase + 2 * i + 1].astype(jnp.float32) / 65536.0
        span_top = sig_ref[0, pl.ds(start_ref[lbase + 2 * i], span_pad)]
        span_bot = sig_ref[0, pl.ds(start_ref[lbase + 2 * i + 1], span_pad)]
        pos_top = jnp.maximum(c_pos + f_top, 0.0)
        pos_bot = jnp.maximum(c_pos + f_bot, 0.0)
        w_top = jnp.maximum(0.0, 1.0 - jnp.abs(s_idx - pos_top))
        w_bot = jnp.maximum(0.0, 1.0 - jnp.abs(s_idx - pos_bot))
        top = jax.lax.dot_general(
            span_top[None, :], w_top,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bot = jax.lax.dot_general(
            span_bot[None, :], w_bot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, i, :] = ((1.0 - w_r) * top + w_r * bot)[0]


@functools.partial(
    jax.jit,
    static_argnames=("frame_len", "y_t", "x_t", "out_shape", "interpret"),
)
def frames_to_screens_pallas(
    env: jnp.ndarray,
    frame_starts: jnp.ndarray,
    frame_len: int,
    y_t: int,
    x_t: int,
    out_shape: tuple[int, int] = RENDER_SIZE,
    interpret: bool = False,
) -> jnp.ndarray:
    """All frames of a block → (n_frames, h, w) screens in one pallas_call.

    ``frame_starts`` may be static or traced (integer sample offsets)."""
    h_out, w_out = out_shape
    if h_out % _ROWS_PER_TILE:
        raise ValueError(f"output height must be a multiple of {_ROWS_PER_TILE}")
    n_frames = int(frame_starts.shape[0])
    start, frac, wr, cols, _ = _screen_geometry(frame_len, y_t, x_t, out_shape)
    delta = float(cols[1]) if w_out > 1 else 0.0
    span = int(np.ceil(cols[-1] + 1)) + 2
    span_pad = -(-span // 128) * 128

    raw_start = start.reshape(-1)
    line_start = np.maximum(raw_start, 0)
    line_frac = (frac.reshape(-1) + (raw_start - line_start)).astype(np.float32)
    # Per-(frame, line) DMA start = frame start + line start (clamped ≥ 0).
    starts_all = (
        jnp.asarray(frame_starts, jnp.int32)[:, None]
        + jnp.asarray(line_start, jnp.int32)[None, :]
    ).reshape(-1)
    # 16.16 fixed point for the int32-only scalar-prefetch path.
    frac_fix = np.round(line_frac * 65536.0).astype(np.int32)
    fracs_all = jnp.tile(jnp.asarray(frac_fix), n_frames)

    env_pad = jnp.concatenate(
        [env.astype(jnp.float32),
         jnp.broadcast_to(env[-1], (span_pad,)).astype(jnp.float32)]
    )[None, :]  # 2-D: Mosaic handles (1, N) layouts far better than 1-D

    # Prefer the DMA-free VMEM-resident variant when the envelope block fits
    # comfortably (≤ 8 MB); fall back to explicit DMA double-buffering.
    vmem_resident = env_pad.size * 4 <= 8 * 1024 * 1024
    if vmem_resident:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_frames, h_out // _ROWS_PER_TILE),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, _ROWS_PER_TILE, w_out),
                lambda f, i, *_: (f, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[],
        )

        def kernel(start_ref, frac_ref, wr_ref, sig_ref, out_ref):
            _kernel_vmem(
                start_ref, frac_ref, wr_ref, sig_ref, out_ref,
                span_pad=span_pad, w_out=w_out, delta=delta, h_out=h_out,
            )

    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # starts, fracs, wr
            grid=(n_frames, h_out // _ROWS_PER_TILE),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, _ROWS_PER_TILE, w_out),
                lambda f, i, *_: (f, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * _ROWS_PER_TILE, span_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * _ROWS_PER_TILE,)),
            ],
        )

        def kernel(start_ref, frac_ref, wr_ref, sig_ref, out_ref, span_buf, sem):
            _kernel(
                start_ref, frac_ref, wr_ref, sig_ref, out_ref, span_buf, sem,
                span_pad=span_pad, w_out=w_out, delta=delta, h_out=h_out,
            )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_frames, h_out, w_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        starts_all,
        fracs_all,
        jnp.asarray(np.round(wr[:, 0] * 65536.0).astype(np.int32)),
        env_pad,
    )


def frame_to_screen_pallas(
    sig: jnp.ndarray,
    y_t: int,
    x_t: int,
    out_shape: tuple[int, int] = RENDER_SIZE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-frame convenience wrapper over ``frames_to_screens_pallas``."""
    out = frames_to_screens_pallas(
        sig,
        jnp.zeros((1,), jnp.int32),
        sig.shape[0],
        y_t,
        x_t,
        out_shape,
        interpret=interpret,
    )
    return out[0]
