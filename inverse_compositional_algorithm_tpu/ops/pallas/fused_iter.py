"""Fully-fused IC iteration kernel: warp -> residual -> IRLS weight ->
normal-equation moments, one pass over the image.

This is SURVEY §7's "single hot kernel": everything the solver loop needs
per Gauss-Newton iteration except the 8x8 solve/compose. The separate-op
pipeline (ops/pallas/warp.py + models/ic.py + ops/pallas/normal_eq.py)
streams ~10 full image planes through HBM per iteration and pays several
kernel dispatches:

    warp (write iw) -> residual (read iw, i1) -> rho (read di)
    -> u,v moments (read ix, iy, di) -> stack 5 maps -> moment kernel.

Here one kernel reads each input plane exactly once and writes only the
[B, K, 8, 8] coordinate-moment matrices (K = 5 robust / 2 quadratic); no
per-pixel intermediate ever touches HBM. Per 8x128 output tile:

  1. banded bicubic warp of the VMEM-resident planar moving image
     (identical tap math and band logic to ops/pallas/warp.py — see its
     module docstring for the layout and the band-coverage contract);
  2. per-row epilogue: masked residual DI, robust weight rho'(sum_c DI^2),
     channel-reduced moments u = sum_c Ix*DI, v = sum_c Iy*DI
     (semantics of models/ic._masked_residual +
     ops.normal_equations.robust_weights/residual_moments, reference
     src/inverse_compositional_algorithm.py:225-244);
  3. the five weighted maps contract against per-tile coordinate power
     matrices on the MXU (same math as ops/pallas/normal_eq.py), giving
     the tile's contribution to the preconditioned H and b.

The caller assembles H/b from the moments with the static per-transform
tensors of ops/pallas/normal_eq and falls back to the exact XLA op chain
via `lax.cond` when any tile's y-taps overflow the band (same predicate as
ops/pallas/warp.warp_image_fast), so arbitrary motions stay exact.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..normal_equations import RobustLoss, rhop
from ..transforms import TransformType
from ..warp import bicubic_sample, domain_mask, keys_cubic_weights
from .normal_eq import _assemble_b, _assemble_h
from .warp import TR, TW, pad_planar, plan_fast_warp

__all__ = ["FusedIterPlan", "plan_fused_iter", "fused_iter_moments",
           "band_overflow"]

_KPAD = 8   # moment maps padded to one sublane tile


def _iter_kernel(lam_ref, gx_ref, gy_ref, img_ref, i1_ref, ix_ref, iy_ref,
                 g3_ref, m_ref, *, height, width, chans, hb, inv_l,
                 robust: RobustLoss | None, nanifoutside: bool, delta: int,
                 nk: int):
    f32 = jnp.float32
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    @pl.when((ty == 0) & (tx == 0))
    def _():
        m_ref[...] = jnp.zeros_like(m_ref)

    gx = gx_ref[0]
    gy = gy_ref[0]

    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    wxs = keys_cubic_weights(gx - x0f)
    wys = keys_cubic_weights(gy - y0f)

    hp8 = img_ref.shape[2]
    ym = (jnp.clip(jnp.min(y0) - 1, 0, hp8 - hb) // 8) * 8
    ym = pl.multiple_of(ym, 8)

    gtx = [jnp.clip(x0 + (i - 1), 0, width - 1) for i in range(4)]
    lty = [jnp.clip(jnp.clip(y0 + (j - 1), 0, height - 1) - ym, 0, hb - 1)
           for j in range(4)]

    ch = chans * hb
    nych = hb // 8
    d = float(delta)

    rows = [None] * TR   # per-row [nk, TW] weighted-map rows
    for r in range(TR):
        # ---- banded warp (identical to ops/pallas/warp._warp_kernel) ----
        cs = jnp.min(gtx[0][r : r + 1]) // TW
        ce = jnp.max(gtx[3][r : r + 1]) // TW + 1
        loc4 = [gtx[i][r : r + 1] for i in range(4)]
        wx4 = [wxs[i][r : r + 1] for i in range(4)]

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

        iw_rows = []
        for cc in range(chans):
            e_ch = e_r[cc * hb : (cc + 1) * hb]
            acc = jnp.zeros((8, TW), f32)
            for j in range(4):
                lj = lty[j][r : r + 1]
                wj = wys[j][r : r + 1]
                for sc in range(nych):
                    src = e_ch[sc * 8 : (sc + 1) * 8]
                    loc = lj - sc * 8
                    inb = (loc >= 0) & (loc < 8)
                    li = jnp.clip(loc, 0, 7)
                    g = jnp.take_along_axis(
                        src, jnp.broadcast_to(li, (8, TW)), axis=0)
                    acc = acc + g * jnp.where(inb, wj, 0.0)
            iw_rows.append(acc[:1])                    # [1, TW]

        # ---- epilogue: residual, weight, channel-reduced moments ----
        gxr = gx[r : r + 1]
        gyr = gy[r : r + 1]
        valid = ((gxr >= d) & (gxr <= (width - 1) - d)
                 & (gyr >= d) & (gyr <= (height - 1) - d)).astype(f32)

        u = jnp.zeros((1, TW), f32)
        v = jnp.zeros((1, TW), f32)
        t2 = jnp.zeros((1, TW), f32)
        for cc in range(chans):
            i1c = i1_ref[0, cc, r, :].reshape(1, TW)
            if nanifoutside:
                dic = (iw_rows[cc] - i1c) * valid
            else:
                dic = iw_rows[cc] * valid - i1c
            u = u + ix_ref[0, cc, r, :].reshape(1, TW) * dic
            v = v + iy_ref[0, cc, r, :].reshape(1, TW) * dic
            if robust is not None:
                t2 = t2 + dic * dic

        if robust is not None:
            rho = rhop(t2, lam_ref[0, 0], robust)
            maps = [rho * g3_ref[0, k, r, :].reshape(1, TW) for k in range(3)]
            maps += [rho * u, rho * v]
        else:
            maps = [u, v]
        rows[r] = jnp.concatenate(maps, axis=0)        # [nk, TW]

    w_all = jnp.stack(rows, axis=0)                    # [TR, nk, TW]

    # Real-pixel mask (grid is edge-padded to full tiles).
    lx = jax.lax.broadcasted_iota(jnp.int32, (TR, TW), 1) + tx * TW
    ly = jax.lax.broadcasted_iota(jnp.int32, (TR, TW), 0) + ty * TR
    ok = ((lx < width) & (ly < height)).astype(f32)

    # Per-tile coordinate power matrices (normalized by 1/L, like
    # ops/pallas/normal_eq._moment_kernel).
    xn = (jax.lax.broadcasted_iota(jnp.int32, (TW, _KPAD), 0)
          + tx * TW).astype(f32) * inv_l
    xs = []
    cur = jnp.ones((TW, 1), f32)
    base = xn[:, :1]
    for a in range(_KPAD):
        if a > 0:
            cur = cur * base
        xs.append(cur if a < 5 else jnp.zeros_like(cur))
    x_mat = jnp.concatenate(xs, axis=1)                # [TW, 8]

    yn = (jax.lax.broadcasted_iota(jnp.int32, (_KPAD, TR), 1)
          + ty * TR).astype(f32) * inv_l
    ys = []
    cur = jnp.ones((1, TR), f32)
    base = yn[:1, :]
    for b in range(_KPAD):
        if b > 0:
            cur = cur * base
        ys.append(cur if b < 5 else jnp.zeros_like(cur))
    y_mat = jnp.concatenate(ys, axis=0)                # [8, TR]

    hi = jax.lax.Precision.HIGHEST
    for k in range(nk):
        wk = w_all[:, k, :] * ok                       # [TR, TW]
        wx = jnp.dot(wk, x_mat, preferred_element_type=f32, precision=hi)
        m = jnp.dot(y_mat, wx, preferred_element_type=f32, precision=hi)
        m_ref[0, k] += m


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "hb", "robust", "nanifoutside", "delta", "interpret"))
def fused_iter_moments(i2p, i1p, ixp, iyp, g3p, gx, gy, lam,
                       height: int, width: int, hb: int,
                       robust: RobustLoss | None, nanifoutside: bool,
                       delta: int, interpret: bool = False):
    """[B, K, 8, 8] weighted coordinate moments of one IC iteration.

    Args:
      i2p: [B, C, Hp, Wp] planar moving image (pad_planar).
      i1p, ixp, iyp: [B, C, Hp, Wp] planar template / its gradients
        (boundary-band pre-masked, like models/ic.py).
      g3p: [B, 3, Hp, Wp] planar (gxx, gxy, gyy) moments; ignored (pass
        i1p) when robust is None.
      gx, gy: [B, H, W] warp coordinates.
      lam: [] or [1] runtime robust threshold (ignored when robust is None).
      robust: RobustLoss, or None for the quadratic path (K = 2: u, v).

    Returns:
      m [B, K, 8, 8], K = 5 (w*gxx, w*gxy, w*gyy, w*u, w*v) or 2 (u, v);
      assemble with ops.pallas.normal_eq._assemble_h / _assemble_b.
    """
    b, c, hp8, wp = i2p.shape
    hp = -(-height // TR) * TR
    wg = -(-width // TW) * TW
    if gx.shape[-2:] != (hp, wg):
        pad = ((0, 0), (0, hp - height), (0, wg - width))
        gx = jnp.pad(gx, pad, mode="edge")
        gy = jnp.pad(gy, pad, mode="edge")
    nk = 2 if robust is None else 5
    lam = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    grid = (b, hp // TR, wg // TW)
    kernel = functools.partial(
        _iter_kernel, height=height, width=width, chans=c, hb=hb,
        inv_l=1.0 / float(max(height, width)), robust=robust,
        nanifoutside=nanifoutside, delta=delta, nk=nk)
    tile = lambda bb, ty, tx: (bb, ty, tx)
    whole = lambda bb, ty, tx: (bb, 0, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bb, ty, tx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TW), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, TW), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hp8, wp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TR, TW), lambda bb, ty, tx: (bb, 0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TR, TW), lambda bb, ty, tx: (bb, 0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, TR, TW), lambda bb, ty, tx: (bb, 0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TR, TW), lambda bb, ty, tx: (bb, 0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nk, 8, 8), lambda bb, ty, tx: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nk, 8, 8), jnp.float32),
        interpret=interpret,
    )(lam, gx, gy, i2p, i1p, ixp, iyp, g3p)


def band_overflow(gy, height: int, hb: int):
    """Scalar bool: does any 8x128 tile's y-tap span overflow the hb-band?

    Exact twin of the predicate inside ops/pallas/warp.warp_image_fast
    (shared so the fused-iteration caller can gate on the same condition).
    """
    b = gy.shape[0]
    hh, ww = gy.shape[-2:]
    typ = -(-hh // TR) * TR
    txp = -(-ww // TW) * TW
    y0 = jnp.floor(gy)
    y0p = jnp.pad(y0, ((0, 0), (0, typ - hh), (0, txp - ww)), mode="edge")
    y0t = y0p.reshape(b, typ // TR, TR, txp // TW, TW)
    ymin = jnp.min(y0t, axis=(2, 4))
    ymax = jnp.max(y0t, axis=(2, 4))
    hp8 = -(-height // 8) * 8
    ym = (jnp.clip(ymin - 1, 0, hp8 - hb) // 8) * 8
    ytop = jnp.clip(ymax + 2, 0, height - 1)
    return jnp.any(ytop - ym > hb - 1)


@dataclass(frozen=True)
class FusedIterPlan:
    """Static feasibility + precomputed planar operands for the fused
    iteration (built once per ic_solve; everything here is loop-invariant)."""

    hb: int
    i2p: Any
    i1p: Any
    ixp: Any
    iyp: Any
    g3p: Any


def plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy) -> FusedIterPlan | None:
    """Build the plan, or None when the shape/dtype is unsupported.

    VMEM budget mirrors plan_fast_warp (the resident planar moving image
    dominates); the per-tile operand blocks are negligible.
    """
    b, h, w, c = i1.shape
    hb = plan_fast_warp(h, w, c, i1.dtype)
    if hb is None:
        return None
    return FusedIterPlan(
        hb=hb,
        i2p=pad_planar(i2),
        i1p=pad_planar(i1),
        ixp=pad_planar(ix),
        iyp=pad_planar(iy),
        g3p=pad_planar(jnp.stack([gxx, gxy, gyy], axis=-1)),
    )
