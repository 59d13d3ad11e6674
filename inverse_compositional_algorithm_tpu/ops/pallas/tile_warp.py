"""Shared per-tile bicubic warp core for the Pallas kernels.

One implementation of "warp an 8x128 output tile of a planar VMEM-resident
image" used by both ops/pallas/warp.py (standalone warp) and
ops/pallas/fused_iter.py (fused IC iteration) — the single source of truth
for band/tap logic (round-2 review flagged the hand-maintained duplicate).

Two per-tile execution paths, selected by an in-kernel predicate:

* FAST path — for smooth warps (the steady-state of every alignment):
  across the tile's 8 rows the integer x-taps move by at most one column,
  so the per-pixel 4-tap window is contained in 5 columns around
  min_r floor(gx). The kernel issues just FIVE shared lane-gathers of the
  whole [C*HB_FAST, TW] row band per tile (vs 4 per *output row* before,
  an ~6x cut in gathered volume), then per output row combines them with
  dense Keys weights: an x-weight FMA over the band and a dense y-weight
  reduction over band rows (no sublane gathers at all — the 4-tap y
  support falls out of Keys' |t|>=2 zeros). Boundary semantics stay exact:
  x taps are index-clipped like the reference (Neumann), bottom y taps
  land on pad_planar's duplicated edge rows, and top tap rows -1..-2 are
  folded into row 0 via the `extra` weight term, valid for gy >= -2 (the
  predicate enforces it; reference: src/bicubic_interpolation.py:8-23).

* GENERAL path — anything else (large rotations/shears, far out-of-domain
  rows): the round-2 banded algorithm, upgraded from a per-tile to a
  per-output-row band so the in-kernel coverage extends to per-row y-spans
  of HB-11 columns (|dgy/dx| <= (HB-11)/128 ~ 0.16 at HB=32, ~9.4
  degrees) instead of per-tile spans. x-pass: 4 lane-gathers per row over
  the [C*HB, TW] band; y-pass: 4 taps x HB/8 single-vreg sublane gathers.

Callers only need the XLA fallback (`row_band_overflow`) when even the
per-row band cannot cover the warp — which makes the fallback a rare
extreme-motion escape hatch rather than a cliff the whole batch falls off
whenever one pair rotates (round-2 "batch-global fallback" finding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..warp import keys_cubic_weights

__all__ = ["TR", "TW", "HB", "HB_FAST", "keys_eval", "warp_tile",
           "row_band_overflow", "padded_height"]

TR = 8        # output rows per tile (one vreg of sublanes)
TW = 128      # output cols per tile (lane dim)
HB = 32       # general-path band height (multiple of 8)
HB_FAST = 24  # fast-path band height (multiple of 8)


def padded_height(height: int) -> int:
    """Planar padded row count: height + 2 duplicate edge rows (so bottom
    bicubic taps resolve to the Neumann clamp), rounded up to a sublane
    multiple so 8-aligned dynamic band slices can reach the bottom."""
    return -(-(height + 2) // 8) * 8


def keys_eval(t):
    """Keys (a=-0.5) cubic kernel evaluated at arbitrary offsets.

    K(t) = 1.5|t|^3-2.5|t|^2+1 for |t|<=1, -0.5|t|^3+2.5|t|^2-4|t|+2 for
    1<|t|<2, else 0 — the same basis as keys_cubic_weights (which is the
    factored 4-tap special case; reference
    src/keras-tf/tf_bicubic_interpolation.py:5-29).
    """
    a = jnp.abs(t)
    a2 = a * a
    near = (1.5 * a - 2.5) * a2 + 1.0
    far = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def warp_tile(gx, gy, img_ref, write_row, *, height, width, chans):
    """Bicubic-warp one 8x128 tile of a planar image.

    Args:
      gx, gy: [TR, TW] f32 source coordinates of the tile's pixels
        (edge-padded to full tiles by the caller, so every value is sane).
      img_ref: ref [1, C, Hp, Wp] planar padded source (resident in VMEM),
        Hp = padded_height(height), Wp a multiple of TW.
      write_row: callback (channel, row, values[1, TW]) storing one output
        row — lets each kernel direct output to its own ref layout.
      height, width: true image dims (tap clipping bounds).
    """
    f32 = jnp.float32
    hp8 = img_ref.shape[2]

    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    ymin = jnp.min(y0)
    ymax = jnp.max(y0)
    x0mn = jnp.min(x0, axis=0, keepdims=True)          # [1, TW]

    # Fast-path preconditions (see module docstring).
    ymf = (jnp.clip(ymin - 1, 0, hp8 - HB_FAST) // 8) * 8
    fast = ((jnp.max(x0 - x0mn) <= 1)
            & (ymax + 2 - ymf <= HB_FAST - 1)
            & (ymin >= -2))

    chf = chans * HB_FAST
    ch = chans * HB

    @pl.when(fast)
    def _fast():
        ym = pl.multiple_of(ymf, 8)
        # Five shared tap-column gathers for the whole tile.
        cxs = [jnp.clip(x0mn + j, 0, width - 1) for j in range(-1, 4)]
        cs = jnp.min(cxs[0]) // TW
        ce = jnp.max(cxs[4]) // TW + 1

        def chunk_body(c, gs, cxs=cxs):
            off = pl.multiple_of(c * TW, TW)
            band = img_ref[0, :, pl.ds(ym, HB_FAST), pl.ds(off, TW)]
            band = band.reshape(chf, TW)
            out = []
            for j in range(5):
                loc = cxs[j] - c * TW
                inb = (loc >= 0) & (loc < TW)
                li = jnp.clip(loc, 0, TW - 1)
                t = jnp.take_along_axis(
                    band, jnp.broadcast_to(li, (chf, TW)), axis=1)
                out.append(gs[j] + jnp.where(inb, t, 0.0))
            return tuple(out)

        gs = jax.lax.fori_loop(
            cs, ce, chunk_body,
            tuple(jnp.zeros((chf, TW), f32) for _ in range(5)))

        xm = x0mn.astype(f32)
        ymf32 = ym.astype(f32)
        s_col = jax.lax.broadcasted_iota(
            jnp.int32, (HB_FAST, TW), 0).astype(f32)
        for r in range(TR):
            gxr = gx[r : r + 1]
            gyr = gy[r : r + 1]
            # x-interpolated band F for this row: 5 dense FMAs.
            f = gs[0] * keys_eval(gxr - (xm - 1.0))
            for j in range(1, 5):
                f = f + gs[j] * keys_eval(gxr - (xm + (j - 1.0)))
            # Dense y weights over band rows; fold clipped top taps into
            # row 0 (only possible when the band starts at the image top).
            wy = keys_eval(gyr - (ymf32 + s_col))          # [HB_FAST, TW]
            extra = jnp.where(
                ym == 0,
                keys_eval(gyr + 1.0) + keys_eval(gyr + 2.0),
                jnp.zeros_like(gyr))
            wy = jnp.concatenate([wy[:1] + extra, wy[1:]], axis=0)
            prod = f.reshape(chans, HB_FAST, TW) * wy[None]
            vals = jnp.sum(prod, axis=1)                   # [chans, TW]
            for cc in range(chans):
                write_row(cc, r, vals[cc : cc + 1])

    @pl.when(jnp.logical_not(fast))
    def _general():
        wxs = keys_cubic_weights(gx - x0f)
        wys = keys_cubic_weights(gy - y0f)
        for r in range(TR):
            y0r = y0[r : r + 1]
            ymr = (jnp.clip(jnp.min(y0r) - 1, 0, hp8 - HB) // 8) * 8
            ymr = pl.multiple_of(ymr, 8)
            gtx = [jnp.clip(x0[r : r + 1] + (i - 1), 0, width - 1)
                   for i in range(4)]
            lty = [jnp.clip(
                jnp.clip(y0r + (j - 1), 0, height - 1) - ymr, 0, HB - 1)
                for j in range(4)]
            wx4 = [wxs[i][r : r + 1] for i in range(4)]
            cs = jnp.min(gtx[0]) // TW
            ce = jnp.max(gtx[3]) // TW + 1

            def chunk_body(c, e, gtx=gtx, wx4=wx4, ymr=ymr):
                off = pl.multiple_of(c * TW, TW)
                band = img_ref[0, :, pl.ds(ymr, HB), pl.ds(off, TW)]
                band = band.reshape(ch, TW)
                for i in range(4):
                    loc = gtx[i] - c * TW
                    inb = (loc >= 0) & (loc < TW)
                    li = jnp.clip(loc, 0, TW - 1)
                    g = jnp.take_along_axis(
                        band, jnp.broadcast_to(li, (ch, TW)), axis=1)
                    e = e + g * jnp.where(inb, wx4[i], 0.0)
                return e

            e_r = jax.lax.fori_loop(cs, ce, chunk_body,
                                    jnp.zeros((ch, TW), f32))
            for cc in range(chans):
                e_ch = e_r[cc * HB : (cc + 1) * HB]
                acc = jnp.zeros((8, TW), f32)
                for j in range(4):
                    lj = lty[j]
                    wj = wys[j][r : r + 1]
                    for sc in range(HB // 8):
                        src = e_ch[sc * 8 : (sc + 1) * 8]
                        loc = lj - sc * 8
                        inb = (loc >= 0) & (loc < 8)
                        li = jnp.clip(loc, 0, 7)
                        g = jnp.take_along_axis(
                            src, jnp.broadcast_to(li, (8, TW)), axis=0)
                        acc = acc + g * jnp.where(inb, wj, 0.0)
                write_row(cc, r, acc[:1])


def row_band_overflow(gy, height: int):
    """[B] bool: does any OUTPUT ROW's y-tap span overflow the general
    path's per-row HB band? Only then must a caller fall back to the XLA
    gather sampler — the exact coverage contract of `warp_tile`'s general
    path (per-row 8-aligned band of HB rows).

    Evaluated in plain XLA on the same gy the kernel will see. Per output
    row and 128-column tile segment: span = clip(max(y0)+2, 0, height-1)
    - 8-aligned(clip(min(y0)-1, 0, Hp-HB)); overflow when span > HB-1.
    """
    b = gy.shape[0]
    hh, ww = gy.shape[-2:]
    txp = -(-ww // TW) * TW
    hp8 = padded_height(height)
    y0 = jnp.floor(gy)
    y0p = jnp.pad(y0, ((0, 0), (0, 0), (0, txp - ww)), mode="edge")
    y0t = y0p.reshape(b, hh, txp // TW, TW)
    ymin = jnp.min(y0t, axis=-1)
    ymax = jnp.max(y0t, axis=-1)
    ym = (jnp.clip(ymin - 1, 0, hp8 - HB) // 8) * 8
    ytop = jnp.clip(ymax + 2, 0, height - 1)
    return jnp.any(ytop - ym > HB - 1, axis=(1, 2))
