"""Pallas bicubic warp — the standalone per-iteration hot op.

The XLA lowering of the 16-tap gather warp (ops/warp.py::bicubic_sample)
runs at ~0.3 G gathered elements/s on TPU (scalar gather path): 530 ms per
batch-16 584x388 warp, ~100x off the roofline. This kernel rebuilds the
warp around the VPU's native moves (lane/sublane dynamic gathers + dense
FMAs); the actual per-tile algorithm — a fast shared-gather path for
smooth warps and a per-row banded general path — lives in
ops/pallas/tile_warp.py (shared with the fused iteration kernel).

Layout: the source image is planar [B, C, Hp, Wp] (channel-major, rows in
sublanes, columns in lanes; pad_planar pads rows by 2 duplicated edge rows
to a sublane multiple and columns to the 128-lane tile). Small frames keep
the plane resident in VMEM for the whole batch slice of the grid; frames
above the VMEM budget stream through double-buffered row-band windows
prefetched one output band ahead (stream=True, plan_warp_mode).

Tap clipping matches `bicubic_sample` (Neumann boundary, reference
src/bicubic_interpolation.py:8-23) so results agree with the XLA path up
to float summation order. The kernel is exact for ARBITRARY motion (the
general path loops y-tap segments, see tile_warp.py), so there is no
fallback; the XLA gather sampler remains only as the CPU / oracle path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..warp import domain_mask
from .tile_warp import (
    HB,
    TR,
    TW,
    ResidentImage,
    WindowedImage,
    padded_height,
    warp_tile,
)

__all__ = ["pallas_warp_planar", "warp_image_fast", "fast_warp_supported",
           "plan_fast_warp", "plan_warp_mode", "pad_planar", "band_starts",
           "stream_window_rows"]

# Streaming-mode window height (rows of the moving image kept in VMEM per
# output row band). Must be a multiple of 8 and >= HB_FAST + 8; covers a
# cross-row source-y wander of window - (8 + 3 taps + 8 align) pixels.
STREAM_WINDOW_ROWS = 48

# VMEM budget for the double-buffered resident plane (12 MB of the ~16 MB
# per-core VMEM; beyond it the streaming mode takes over).
_RESIDENT_BUDGET = 12 * 1024 * 1024


def stream_window_rows(height: int, width: int = 0, chans: int = 3) -> int:
    """Window rows for a streamed image of this (padded) height.

    Ultra-wide frames (8K+) shrink the window so the double-buffered
    [2, C, wh, Wp] scratch stays within ~6 MB of VMEM; 32 rows still
    leaves 12+ rows of cross-row y-wander for the fast path."""
    wh = STREAM_WINDOW_ROWS
    if width:
        wp = -(-width // TW) * TW
        while wh > 32 and 2 * chans * wh * wp * 4 > 6 * 1024 * 1024:
            wh -= 8
    return min(wh, padded_height(height))


def _warp_kernel(gx_ref, gy_ref, img_ref, out_ref, *, height, width, chans):
    # gx/gy arrive edge-padded to full 8x128 tiles (see pallas_warp_planar),
    # so every block element is a real, sane coordinate.
    def write_row(cc, r, vals):
        out_ref[0, cc, r, :] = vals[0]

    warp_tile(gx_ref[0], gy_ref[0], ResidentImage(img_ref), write_row,
              height=height, width=width, chans=chans)


def band_starts(gy, hp8: int, wh: int):
    """[B * nty + 1] 8-aligned window origin rows, one per (pair, output
    row band), from the warp's y coordinates (gy already edge-padded to a
    TR multiple). The +1 pad entry lets the kernel prefetch band k+1
    unconditionally."""
    b, hp, _ = gy.shape
    nty = hp // TR
    mn = jnp.min(gy.reshape(b, nty, -1), axis=-1)
    ys = jnp.floor(mn).astype(jnp.int32) - 1
    ys = (jnp.clip(ys, 0, hp8 - wh) // 8) * 8
    ys = ys.reshape(b * nty)
    return jnp.concatenate([ys, ys[-1:]])


def _stream_prologue(ys_ref, img_ref, win_ref, wsem_ref, wh: int):
    """Double-buffered window DMA across the (b, ty, tx) grid: at the first
    tx step of each (b, ty) row band, wait for this band's window and
    prefetch the next band's into the other slot. Grid steps execute
    sequentially on the core, so slot reuse is race-free."""
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    nty = pl.num_programs(1)
    nbands = pl.num_programs(0) * nty
    band = b * nty + ty
    two = jnp.asarray(2, band.dtype)
    slot = jax.lax.rem(band, two)

    def dma(slot_i, bid):
        ys = pl.multiple_of(ys_ref[bid], 8)   # band_starts aligns them
        return pltpu.make_async_copy(
            img_ref.at[bid // nty, :, pl.ds(ys, wh), :],
            win_ref.at[slot_i],
            wsem_ref.at[slot_i],
        )

    @pl.when(tx == 0)
    def _():
        @pl.when(band == 0)
        def _():
            dma(0, 0).start()

        @pl.when(band + 1 < nbands)
        def _():
            dma(jax.lax.rem(band + 1, two), band + 1).start()

        dma(slot, band).wait()

    return WindowedImage(win_ref, slot, ys_ref[band], wh, img_ref,
                         b, None, None)


def _warp_kernel_stream(ys_ref, gx_ref, gy_ref, img_ref, out_ref,
                        win_ref, wsem_ref, gband_ref, gsem_ref, *,
                        height, width, chans, wh):
    img = _stream_prologue(ys_ref, img_ref, win_ref, wsem_ref, wh)
    img.gband = gband_ref
    img.gsem = gsem_ref

    def write_row(cc, r, vals):
        out_ref[0, cc, r, :] = vals[0]

    warp_tile(gx_ref[0], gy_ref[0], img, write_row,
              height=height, width=width, chans=chans)


def _pad_grid(g, hp: int, wp: int):
    """Edge-pad [B, H, W] coordinates to full 8x128 tiles: padded entries
    duplicate real coordinates, keeping the kernel's band reductions sane
    and identical to the caller's overflow predicate."""
    b, h, w = g.shape
    if h == hp and w == wp:
        return g
    return jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret",
                                             "stream"))
def pallas_warp_planar(img_p, gx, gy, height: int, width: int,
                       interpret: bool = False, stream: bool = False):
    """Bicubic-warp a planar image batch at per-pixel coordinates.

    Args:
      img_p: [B, C, Hp, Wp] planar float32 source from `pad_planar`
        (Hp = padded_height(height), Wp a multiple of 128; the pad rows
        duplicate the bottom edge and double as the Neumann clamp for
        bottom taps).
      gx, gy: [B, H, W] source coordinates (edge-padded to tiles here).
      height, width: true image dims (tap clipping bounds).
      stream: large-frame mode — img_p stays in HBM; row-band windows are
        DMA'd ahead of compute (see tile_warp.WindowedImage). Numerically
        identical to the resident mode.

    Returns:
      [B, C, h_out, w_out] warped planar image (h_out/w_out = the grid
      dims — a row-sharded caller passes its local-rows grid while
      `height`/`width` stay the FULL source dims), exact for arbitrary
      coordinates (bit-comparable to ops.warp.bicubic_sample up to
      summation order).
    """
    b, c, hp8, wp = img_p.shape
    h_out, w_out = gx.shape[-2:]
    hp = -(-h_out // TR) * TR
    wg = -(-w_out // TW) * TW
    gx = _pad_grid(gx, hp, wg)
    gy = _pad_grid(gy, hp, wg)
    grid = (b, hp // TR, wg // TW)
    out_shape = jax.ShapeDtypeStruct((b, c, hp, wg), jnp.float32)
    if not stream:
        kernel = functools.partial(_warp_kernel, height=height, width=width,
                                   chans=c)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TR, TW), lambda b, ty, tx: (b, ty, tx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TR, TW), lambda b, ty, tx: (b, ty, tx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, hp8, wp), lambda b, ty, tx: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, TR, TW),
                                   lambda b, ty, tx: (b, 0, ty, tx),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(gx, gy, img_p)
        return out[:, :, :h_out, :w_out]

    wh = stream_window_rows(height, width, c)
    ys = band_starts(gy, hp8, wh)
    kernel = functools.partial(_warp_kernel_stream, height=height,
                               width=width, chans=c, wh=wh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TR, TW), lambda b, ty, tx, *_: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TW), lambda b, ty, tx, *_: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # source stays in HBM
        ],
        out_specs=pl.BlockSpec((1, c, TR, TW),
                               lambda b, ty, tx, *_: (b, 0, ty, tx),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, wp), jnp.float32),   # band window x2
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((c, HB, TW), jnp.float32),      # general-path band
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ys, gx, gy, img_p)
    return out[:, :, :h_out, :w_out]


def plan_warp_mode(height: int, width: int, chans: int, dtype) -> str | None:
    """Which Pallas warp mode this shape runs, or None if unsupported.

    "resident": the double-buffered planar plane fits the VMEM budget
    (round-3 path, fastest). "stream": larger frames (>= ~720p RGB f32)
    keep the image in HBM and stream row-band windows — the round-4 fix
    for the silent 530 ms/batch XLA-gather fallback above ~0.5 MP
    (reference handles any size at uniform speed via skimage warp,
    src/bicubic_interpolation.py:154-206; now we do too, on the fused
    path).
    """
    if jnp.dtype(dtype) != jnp.float32:
        return None
    if height < 16 or width < 8 or chans < 1:
        return None
    wp = -(-width // TW) * TW
    hp = padded_height(height)
    if 2 * chans * hp * wp * 4 <= _RESIDENT_BUDGET:
        return "resident"
    wh = stream_window_rows(height, width, chans)
    # double-buffered window + general-path band must fit comfortably
    if 2 * chans * wh * wp * 4 > 8 * 1024 * 1024:
        return None
    return "stream"


def plan_fast_warp(height: int, width: int, chans: int, dtype) -> bool:
    """Static feasibility of the *resident* Pallas warp path (legacy
    gate; large frames are served by plan_warp_mode() == "stream")."""
    return plan_warp_mode(height, width, chans, dtype) == "resident"


fast_warp_supported = plan_fast_warp  # legacy alias


def pad_planar(image):
    """[B, H, W, C] -> [B, C, Hp, Wp] planar edge-padded source.

    Rows pad by >= 2 duplicated edge rows to a multiple of 8 (the
    duplicates ARE the Neumann clamp for bottom bicubic taps, and 8-aligned
    dynamic band slices can reach them), columns to a multiple of 128
    (lane chunks). Hoist this out of the solver loop: it only depends on
    the static image, not on the evolving parameters.
    """
    b, h, w, c = image.shape
    hp = padded_height(h)
    wp = -(-w // TW) * TW
    img_p = image.transpose(0, 3, 1, 2)
    if wp != w or hp != h:
        img_p = jnp.pad(img_p, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                        mode="edge")
    return img_p


def warp_image_fast(image, img_p, gx, gy, delta: int,
                    interpret: bool = False, stream: bool = False):
    """Pallas warp + domain mask (same contract as ops.warp.warp_image).

    Args:
      image: [B, H, W, C] source (shape/dtype reference only).
      img_p: pad_planar(image) — precomputed planar source.
      gx, gy: [B, H, W] warp coordinates (from transform_grid).
      delta: domain-mask margin.
      stream: large-frame HBM-streaming mode (plan_warp_mode == "stream").

    Returns:
      (warped [B, H, W, C], valid [B, H, W]).
    """
    b, hh, ww, c = image.shape
    iw = pallas_warp_planar(img_p, gx, gy, hh, ww, interpret=interpret,
                            stream=stream).transpose(0, 2, 3, 1)
    valid = domain_mask(gx, gy, hh, ww, delta)
    return iw, valid
