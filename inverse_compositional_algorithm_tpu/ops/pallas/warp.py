"""Fused Pallas bicubic warp kernel — the per-iteration hot op.

The XLA lowering of the 16-tap gather warp (ops/warp.py::bicubic_sample)
runs at ~0.3 G gathered elements/s on TPU (scalar gather path): 527 ms per
batch-16 584x388 warp, ~100x off the roofline, dominating the entire
solver. This kernel rebuilds the warp around the two hardware moves the
VPU actually has:

  * `tpu.dynamic_gather` (jnp.take_along_axis) — per-lane shuffles that
    support gathering along the minor (lane) axis for any sublane count,
    and along the sublane axis for single-vreg (8-row) sources;
  * dynamic sublane slicing of VMEM-resident arrays.

Layout: the source image is planar [B, C, H, Wp] (channel-major, rows in
sublanes, columns in lanes, Wp = W padded to the 128-lane tile), resident
in VMEM for the whole (b) slice of the grid. Per output tile of
TR x TW = 8 x 128 pixels:

  1. a band of `hb` source rows (dynamic sublane offset `ym`, derived
     in-kernel from min floor(gy) over the tile) covers all y-taps;
  2. x-pass: for each of the 4 column taps, one lane-gather per 128-lane
     chunk pulls T(m, x0+i-1) for *all* C*hb band rows at once
     ([C*hb, 128] per gather); a dynamic fori over the chunk range
     touched by the row (usually 1-2 of W/128) accumulates the
     x-interpolated band E_r[C*hb, TW];
  3. y-pass: 4 single-vreg sublane-gathers per 8-row chunk of the band
     pick E_r(ly(x)+j-1, x), weighted by the Keys y-weights.

Tap coordinates are clipped to the image edges exactly like
`bicubic_sample` (Neumann boundary, reference src/bicubic_interpolation.py:8-23),
so results are bit-comparable to the XLA path up to float summation order.

Correctness contract: the band covers the tile's y-taps whenever
max(floor(gy))+2 - max(0, min(floor(gy))-1 clipped) < hb within every
8x128 tile — i.e. the warp's vertical shear across 128 columns is under
~hb-8 pixels (|dgy/dx| * 128 + |dgy/dy| * 8 + 3 < hb). The caller
(`warp_image_fast`) computes the exact per-tile overflow predicate in
plain XLA from the same gy field and falls back to the gather sampler via
`lax.cond` when any tile overflows, so arbitrary motions remain exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..warp import bicubic_sample, domain_mask, keys_cubic_weights

__all__ = ["pallas_warp_planar", "warp_image_fast", "fast_warp_supported",
           "plan_fast_warp"]

TR = 8     # output rows per tile (sublane dim of one vreg)
TW = 128   # output cols per tile (lane dim of one vreg)


def _warp_kernel(gx_ref, gy_ref, img_ref, out_ref, *, height, width,
                 chans, hb, wp):
    f32 = jnp.float32

    # gx/gy arrive edge-padded to full 8x128 tiles (see warp_image_fast),
    # so every block element is a real, sane coordinate — no sanitizing
    # needed before the band min/max reductions.
    gx = gx_ref[0]
    gy = gy_ref[0]

    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wxs = keys_cubic_weights(gx - x0f)
    wys = keys_cubic_weights(gy - y0f)

    # Band start: same formula the caller's overflow predicate assumes.
    # Rounded down to a sublane multiple — Mosaic requires 8-aligned
    # dynamic sublane offsets for vector loads. The slice-safety bound is
    # the *padded* image height (pad_planar pads rows to a multiple of 8
    # precisely so an aligned band can still reach the bottom tap rows).
    hp8 = img_ref.shape[2]
    ym = (jnp.clip(jnp.min(y0) - 1, 0, hp8 - hb) // 8) * 8
    ym = pl.multiple_of(ym, 8)

    # Clipped global tap columns / band-local tap rows, [4][TR, TW].
    gtx = [jnp.clip(x0 + (i - 1), 0, width - 1) for i in range(4)]
    lty = [jnp.clip(jnp.clip(y0 + (j - 1), 0, height - 1) - ym, 0, hb - 1)
           for j in range(4)]

    ch = chans * hb
    nych = hb // 8

    for r in range(TR):
        # ---- x-pass: E[C*hb, TW] over the chunks this row touches.
        cs = jnp.min(gtx[0][r : r + 1]) // TW
        ce = jnp.max(gtx[3][r : r + 1]) // TW + 1

        loc4 = [gtx[i][r : r + 1] for i in range(4)]     # [1, TW] i32
        wx4 = [wxs[i][r : r + 1] for i in range(4)]      # [1, TW] f32

        def chunk_body(c, e, loc4=loc4, wx4=wx4):
            off = pl.multiple_of(c * TW, TW)
            band = img_ref[0, :, pl.ds(ym, hb), pl.ds(off, TW)]
            band = band.reshape(ch, TW)
            for i in range(4):
                loc = loc4[i] - c * TW
                inb = (loc >= 0) & (loc < TW)
                li = jnp.clip(loc, 0, TW - 1)
                g = jnp.take_along_axis(
                    band, jnp.broadcast_to(li, (ch, TW)), axis=1)
                e = e + g * jnp.where(inb, wx4[i], 0.0)
            return e

        e_r = jax.lax.fori_loop(cs, ce, chunk_body,
                                jnp.zeros((ch, TW), f32))

        # ---- y-pass per channel: 4 taps x (hb/8) single-vreg gathers.
        for cc in range(chans):
            e_ch = e_r[cc * hb : (cc + 1) * hb]
            acc = jnp.zeros((8, TW), f32)
            for j in range(4):
                lj = lty[j][r : r + 1]                  # [1, TW]
                wj = wys[j][r : r + 1]
                for sc in range(nych):
                    src = e_ch[sc * 8 : (sc + 1) * 8]
                    loc = lj - sc * 8
                    inb = (loc >= 0) & (loc < 8)
                    li = jnp.clip(loc, 0, 7)
                    g = jnp.take_along_axis(
                        src, jnp.broadcast_to(li, (8, TW)), axis=0)
                    acc = acc + g * jnp.where(inb, wj, 0.0)
            out_ref[0, cc, r, :] = acc[0]


def _pad_grid(g, hp: int, wp: int):
    """Edge-pad [B, H, W] coordinates to full 8x128 tiles: padded entries
    duplicate real coordinates, keeping the kernel's band reductions sane
    and identical to the caller's overflow predicate."""
    b, h, w = g.shape
    if h == hp and w == wp:
        return g
    return jnp.pad(g, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")


@functools.partial(jax.jit, static_argnames=("height", "width", "hb",
                                             "interpret"))
def pallas_warp_planar(img_p, gx, gy, height: int, width: int,
                       hb: int = 32, interpret: bool = False):
    """Bicubic-warp a planar image batch at per-pixel coordinates.

    Args:
      img_p: [B, C, H, Wp] planar float32 source, Wp a multiple of 128
        (edge-pad with `pad_planar`; the pad is never sampled, it only
        keeps chunk slicing in bounds).
      gx, gy: [B, H, W] source coordinates (edge-padded to tiles here).
      height, width: true image dims (tap clipping bounds).
      hb: band height (multiple of 8, <= min(32, H)).

    Returns:
      [B, C, H, W] warped planar image. Only valid when every 8x128 tile's
      y-taps fit in an hb-row band (see module docstring); use
      `warp_image_fast` for the checked version with automatic fallback.
    """
    b, c, h, wp = img_p.shape
    hp = -(-height // TR) * TR
    wg = -(-width // TW) * TW
    gx = _pad_grid(gx, hp, wg)
    gy = _pad_grid(gy, hp, wg)
    grid = (b, hp // TR, wg // TW)
    kernel = functools.partial(_warp_kernel, height=height, width=width,
                               chans=c, hb=hb, wp=wp)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TR, TW), lambda b, ty, tx: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TW), lambda b, ty, tx: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, wp), lambda b, ty, tx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, TR, TW), lambda b, ty, tx: (b, 0, ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wg), jnp.float32),
        interpret=interpret,
    )(gx, gy, img_p)
    return out[:, :, :height, :width]


def plan_fast_warp(height: int, width: int, chans: int, dtype) -> int | None:
    """Static feasibility check; returns the band height hb or None.

    Requires f32, enough rows for a band, and the planar image (double
    buffered) to fit comfortably in VMEM (~16 MB on v5e).
    """
    if jnp.dtype(dtype) != jnp.float32:
        return None
    if height < 16 or width < 8 or chans < 1:
        return None
    hb = min(32, -(-height // 8) * 8)
    wp = -(-width // TW) * TW
    hp = -(-height // 8) * 8
    if 2 * chans * hp * wp * 4 > 12 * 1024 * 1024:
        return None
    return hb


fast_warp_supported = plan_fast_warp  # legacy alias


def pad_planar(image):
    """[B, H, W, C] -> [B, C, Hp, Wp] planar edge-padded source.

    Rows pad to a multiple of 8 (so an 8-aligned band can still cover the
    bottom tap rows), columns to a multiple of 128 (lane chunks). The pad
    duplicates edge pixels and is never addressed by clipped taps. Hoist
    this out of the solver loop: it only depends on the static image, not
    on the evolving parameters.
    """
    b, h, w, c = image.shape
    hp = -(-h // 8) * 8
    wp = -(-w // TW) * TW
    img_p = image.transpose(0, 3, 1, 2)
    if wp != w or hp != h:
        img_p = jnp.pad(img_p, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
                        mode="edge")
    return img_p


def warp_image_fast(image, img_p, gx, gy, delta: int, hb: int,
                    interpret: bool = False):
    """Checked fast warp: Pallas kernel, exact XLA fallback on overflow.

    Args:
      image: [B, H, W, C] source (fallback path input).
      img_p: pad_planar(image) — precomputed planar source.
      gx, gy: [B, H, W] warp coordinates (from transform_grid).
      delta: domain-mask margin.

    Returns:
      (warped [B, H, W, C], valid [B, H, W]) — same contract as
      ops.warp.warp_image.
    """
    b, hh, ww, c = image.shape

    # Exact per-tile band-coverage predicate, in plain XLA (no gathers):
    # pad gy to full tiles with edge values, reduce min/max per 8x128 tile.
    typ = -(-hh // TR) * TR
    txp = -(-ww // TW) * TW
    y0 = jnp.floor(gy)
    y0p = jnp.pad(y0, ((0, 0), (0, typ - hh), (0, txp - ww)), mode="edge")
    y0t = y0p.reshape(b, typ // TR, TR, txp // TW, TW)
    ymin = jnp.min(y0t, axis=(2, 4))
    ymax = jnp.max(y0t, axis=(2, 4))
    # Kernel's band start (8-aligned against the padded height,
    # see _warp_kernel / pad_planar).
    hp8 = -(-hh // 8) * 8
    ym = (jnp.clip(ymin - 1, 0, hp8 - hb) // 8) * 8
    ytop = jnp.clip(ymax + 2, 0, hh - 1)          # highest clipped tap row
    overflow = jnp.any(ytop - ym > hb - 1)

    iw = jax.lax.cond(
        overflow,
        lambda: bicubic_sample(image, gx, gy),
        lambda: pallas_warp_planar(img_p, gx, gy, hh, ww, hb=hb,
                                   interpret=interpret)
        .transpose(0, 2, 3, 1),
    )
    valid = domain_mask(gx, gy, hh, ww, delta)
    return iw, valid
