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
to a sublane multiple and columns to the 128-lane tile), resident in VMEM
for the whole batch slice of the grid.

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
from .tile_warp import TR, TW, padded_height, warp_tile

__all__ = ["pallas_warp_planar", "warp_image_fast", "fast_warp_supported",
           "plan_fast_warp", "pad_planar"]


def _warp_kernel(gx_ref, gy_ref, img_ref, out_ref, *, height, width, chans):
    # gx/gy arrive edge-padded to full 8x128 tiles (see pallas_warp_planar),
    # so every block element is a real, sane coordinate.
    def write_row(cc, r, vals):
        out_ref[0, cc, r, :] = vals[0]

    warp_tile(gx_ref[0], gy_ref[0], img_ref, write_row,
              height=height, width=width, chans=chans)


def _pad_grid(g, hp: int, wp: int):
    """Edge-pad [B, H, W] coordinates to full 8x128 tiles: padded entries
    duplicate real coordinates, keeping the kernel's band reductions sane
    and identical to the caller's overflow predicate."""
    b, h, w = g.shape
    if h == hp and w == wp:
        return g
    return jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def pallas_warp_planar(img_p, gx, gy, height: int, width: int,
                       interpret: bool = False):
    """Bicubic-warp a planar image batch at per-pixel coordinates.

    Args:
      img_p: [B, C, Hp, Wp] planar float32 source from `pad_planar`
        (Hp = padded_height(height), Wp a multiple of 128; the pad rows
        duplicate the bottom edge and double as the Neumann clamp for
        bottom taps).
      gx, gy: [B, H, W] source coordinates (edge-padded to tiles here).
      height, width: true image dims (tap clipping bounds).

    Returns:
      [B, C, H, W] warped planar image, exact for arbitrary coordinates
      (bit-comparable to ops.warp.bicubic_sample up to summation order).
    """
    b, c, hp8, wp = img_p.shape
    hp = -(-height // TR) * TR
    wg = -(-width // TW) * TW
    gx = _pad_grid(gx, hp, wg)
    gy = _pad_grid(gy, hp, wg)
    grid = (b, hp // TR, wg // TW)
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
        out_specs=pl.BlockSpec((1, c, TR, TW), lambda b, ty, tx: (b, 0, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wg), jnp.float32),
        interpret=interpret,
    )(gx, gy, img_p)
    return out[:, :, :height, :width]


def plan_fast_warp(height: int, width: int, chans: int, dtype) -> bool:
    """Static feasibility check for the Pallas warp path.

    Requires f32, enough rows for a band, and the planar image (double
    buffered) to fit comfortably in VMEM (~16 MB on v5e).
    """
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if height < 16 or width < 8 or chans < 1:
        return False
    wp = -(-width // TW) * TW
    hp = padded_height(height)
    if 2 * chans * hp * wp * 4 > 12 * 1024 * 1024:
        return False
    return True


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
                    interpret: bool = False):
    """Pallas warp + domain mask (same contract as ops.warp.warp_image).

    Args:
      image: [B, H, W, C] source (shape/dtype reference only).
      img_p: pad_planar(image) — precomputed planar source.
      gx, gy: [B, H, W] warp coordinates (from transform_grid).
      delta: domain-mask margin.

    Returns:
      (warped [B, H, W, C], valid [B, H, W]).
    """
    b, hh, ww, c = image.shape
    iw = pallas_warp_planar(img_p, gx, gy, hh, ww,
                            interpret=interpret).transpose(0, 2, 3, 1)
    valid = domain_mask(gx, gy, hh, ww, delta)
    return iw, valid
