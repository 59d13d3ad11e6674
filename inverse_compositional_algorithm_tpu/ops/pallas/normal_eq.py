"""Fused Pallas kernel: weighted normal equations via coordinate moments.

The per-iteration Gauss-Newton system is

    H[b] = sum_p  w1 Jx Jx^T + w2 (Jx Jy^T + Jy Jx^T) + w3 Jy Jy^T
    r[b] = sum_p  wu Jx + wv Jy

with w* the five channel-reduced scalar maps (ops/normal_equations.py) and
Jx/Jy the analytic warp Jacobian fields. Every Jacobian column is a
polynomial in the pixel coordinates (degree <= 2 — ops/transforms.py
jacobian_fields), so every entry of H and r is an exact linear combination
of weighted coordinate moments

    M_k[a, b] = sum_p w_k(p) * (x/L)^a * (y/L)^b,     a, b in 0..4.

Inside a row-aligned tile, x depends only on the lane index and y only on
the sublane index, which turns each tile's moment matrix into two MXU
matmuls with no layout changes:

    M_tile = Y @ (W_tile @ X),   X[l, a] = (x_l/L)^a,  Y[b, s] = (y_s/L)^b.

The kernel therefore streams the five maps through VMEM exactly once
(speed-of-light HBM traffic), is *independent of the transform type*, and
the tiny type-specific assembly H = T_H . M happens outside in XLA with a
constant tensor built by polynomial convolution of the Jacobian columns.
Coordinates are normalized by L = max(H, W), which is exactly the Hartley
preconditioning of ops.transforms.param_preconditioner — the assembled
system is the preconditioned one, bit-compatible with the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import NPARAMS_MAX
from ..transforms import TransformType

__all__ = ["fused_normal_eq", "fused_hessian", "fused_rhs",
           "weighted_moments"]

_DEG = 5          # moment powers 0..4
_PAD = 8          # powers padded to the 8-sublane/lane tile


def _moment_kernel(w_ref, m_ref, *, width, height, tile_h, inv_l):
    """Grid (B, 5 maps, row-tiles) -> per-(pair, map) moment matrix [8, 8]
    (rows = y-power, cols = x-power; only [0:5, 0:5] meaningful)."""
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        m_ref[...] = jnp.zeros_like(m_ref)

    tw = w_ref.shape[-1]
    # X[l, a] = (x_l/L)^a for a < 5, 0 for the padded powers; built with a
    # static cumulative-product loop (no transcendental pow).
    xi = jax.lax.broadcasted_iota(jnp.int32, (tw, _PAD), 0)
    xn = xi.astype(jnp.float32) * inv_l
    xs = []
    cur = jnp.ones((tw, 1), jnp.float32)
    base = xn[:, :1]
    for a in range(_PAD):
        if a > 0:
            cur = cur * base
        xs.append(cur if a < _DEG else jnp.zeros_like(cur))
    x_mat = jnp.concatenate(xs, axis=1)                      # [tw, 8]

    yi = jax.lax.broadcasted_iota(jnp.int32, (_PAD, tile_h), 1)
    yn = (yi + r * tile_h).astype(jnp.float32) * inv_l
    ys = []
    cur = jnp.ones((1, tile_h), jnp.float32)
    base = yn[:1, :]
    for b in range(_PAD):
        if b > 0:
            cur = cur * base
        ys.append(cur if b < _DEG else jnp.zeros_like(cur))
    y_mat = jnp.concatenate(ys, axis=0)                      # [8, tile_h]

    # Mask padded lanes / overhanging rows (their block contents are
    # uninitialized memory).
    lx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tw), 1)
    ly = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tw), 0) + r * tile_h
    ok = (lx < width) & (ly < height)
    # select (not multiply): padded regions can hold NaN, and NaN * 0 = NaN.
    w = jnp.where(ok, w_ref[0, 0], 0.0)                         # [tile_h, tw]

    # HIGHEST: true-f32 MXU passes — the default bf16 inputs would cost
    # three significant digits in the accumulated moments.
    hi = jax.lax.Precision.HIGHEST
    wx = jnp.dot(w, x_mat, preferred_element_type=jnp.float32,
                 precision=hi)                                   # [th, 8]
    m = jnp.dot(y_mat, wx, preferred_element_type=jnp.float32,
                precision=hi)                                    # [8, 8]
    m_ref[0, 0] += m


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def weighted_moments(maps, tile_h: int = 64, interpret: bool = False):
    """maps: [B, K, H, W] weight planes -> [B, K, 8, 8] coordinate moments
    M[b, k, j, i] = sum_p maps[b,k,p] * (x/L)^i * (y/L)^j  (i, j < 5)."""
    b, k, h, w = maps.shape
    # Row-tile must be a multiple of 8 sublanes (or the whole height).
    th = min(tile_h, h)
    if th != h:
        th = max(8, (th // 8) * 8)
    inv_l = 1.0 / float(max(h, w))
    grid = (b, k, pl.cdiv(h, th))
    kernel = functools.partial(_moment_kernel, width=w, height=h, tile_h=th,
                               inv_l=inv_l)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, th, w), lambda i, j, r: (i, j, r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, _PAD, _PAD), lambda i, j, r: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, _PAD, _PAD), jnp.float32),
        interpret=interpret,
    )(maps)


# ---------------------------------------------------------------------------
# Type-specific assembly tensors (static, numpy)

def _column_polys(ttype: TransformType, l: float):
    """Per parameter column n: 3x3 coefficient grids [y-pow, x-pow] of the
    *preconditioned* Jacobian columns expressed in normalized coordinates
    (x/L, y/L). Preconditioning (param_preconditioner) divides each column
    by L^deg, so normalized coefficients are exactly the raw integer ones."""
    def g(**terms):
        c = np.zeros((3, 3))
        for key, v in terms.items():
            a, b = int(key[1]), int(key[2])   # key like "p10" = x^1 y^0
            c[b, a] = v
        return c

    zero = g()
    one = g(p00=1.0)
    x = g(p10=1.0)
    y = g(p01=1.0)
    if ttype is TransformType.TRANSLATION:
        jx = [one, zero]
        jy = [zero, one]
        scale = [1.0, 1.0]
    elif ttype is TransformType.EUCLIDEAN:
        jx = [one, zero, -y]
        jy = [zero, one, x]
        scale = [1.0, 1.0, l]
    elif ttype is TransformType.SIMILARITY:
        jx = [one, zero, x, -y]
        jy = [zero, one, y, x]
        scale = [1.0, 1.0, l, l]
    elif ttype is TransformType.AFFINITY:
        jx = [one, zero, x, y, zero, zero]
        jy = [zero, one, zero, zero, x, y]
        scale = [1.0, 1.0, l, l, l, l]
    elif ttype is TransformType.HOMOGRAPHY:
        x2 = g(p20=-1.0)
        xy = g(p11=-1.0)
        y2 = g(p02=-1.0)
        jx = [x, y, one, zero, zero, zero, x2, xy]
        jy = [zero, zero, zero, x, y, one, xy, y2]
        scale = [l, l, 1.0, l, l, 1.0, l * l, l * l]
    else:  # pragma: no cover
        raise ValueError(f"unknown transform type {ttype}")

    k = len(jx)
    pad = [zero] * (NPARAMS_MAX - k)
    return jx + pad, jy + pad, scale + [1.0] * (NPARAMS_MAX - k)


@functools.lru_cache(maxsize=None)
def _assembly(ttype: TransformType, height: int, width: int):
    """(T_h [8,8,3,5,5], T_b [8,2,5,5]) constant contraction tensors:
    H[n,m] = sum_{k,j,i} T_h[n,m,k,j,i] * M[k,j,i] with k over (w1,w2,w3);
    r[n]   = sum_{k,j,i} T_b[n,k,j,i] * M[3+k,j,i] with k over (wu,wv)."""
    l = float(max(height, width))
    jx, jy, _ = _column_polys(ttype, l)

    def polymul(a, b):
        out = np.zeros((_DEG, _DEG))
        for (i, j), va in np.ndenumerate(a):
            if va == 0:
                continue
            for (k, m), vb in np.ndenumerate(b):
                if vb == 0:
                    continue
                out[i + k, j + m] += va * vb
        return out

    t_h = np.zeros((NPARAMS_MAX, NPARAMS_MAX, 3, _DEG, _DEG))
    for n in range(NPARAMS_MAX):
        for m in range(NPARAMS_MAX):
            t_h[n, m, 0] = polymul(jx[n], jx[m])
            t_h[n, m, 1] = polymul(jx[n], jy[m]) + polymul(jy[n], jx[m])
            t_h[n, m, 2] = polymul(jy[n], jy[m])
    t_b = np.zeros((NPARAMS_MAX, 2, _DEG, _DEG))
    for n in range(NPARAMS_MAX):
        t_b[n, 0, :3, :3] = jx[n]
        t_b[n, 1, :3, :3] = jy[n]
    # Cache as numpy: caching jnp arrays here would capture a tracer when
    # the first call happens under a jit trace and leak it into later traces.
    return (t_h.astype(np.float32), t_b.astype(np.float32))


def _assemble_h(m, ttype, h, w):
    t_h, _ = _assembly(ttype, h, w)
    return jnp.einsum("bkji,nmkji->bnm", m[:, :, :_DEG, :_DEG],
                      jnp.asarray(t_h), precision=jax.lax.Precision.HIGHEST)


def _assemble_b(m, ttype, h, w):
    _, t_b = _assembly(ttype, h, w)
    return jnp.einsum("bkji,nkji->bn", m[:, :, :_DEG, :_DEG],
                      jnp.asarray(t_b), precision=jax.lax.Precision.HIGHEST)


def fused_normal_eq(w1, w2, w3, wu, wv, *, ttype: TransformType,
                    tile_h: int = 64, interpret: bool = False):
    """H [B,8,8] and r [B,8] (both in the preconditioned metric of
    param_preconditioner) from the five channel-reduced maps [B,H,W].

    Drop-in equivalent of ops.normal_equations.hessian(+rhs) with the
    L-scaled Jacobian; the XLA versions remain the fallback / test oracle.
    """
    b, h, w = w1.shape
    m = weighted_moments(jnp.stack([w1, w2, w3, wu, wv], axis=1),
                         tile_h=tile_h, interpret=interpret)  # [B, 5, 8, 8]
    return _assemble_h(m[:, :3], ttype, h, w), _assemble_b(m[:, 3:], ttype, h, w)


def fused_hessian(w1, w2, w3, *, ttype: TransformType, tile_h: int = 64,
                  interpret: bool = False):
    """H [B,8,8] alone (quadratic-IC precompute path)."""
    b, h, w = w1.shape
    m = weighted_moments(jnp.stack([w1, w2, w3], axis=1), tile_h=tile_h,
                         interpret=interpret)
    return _assemble_h(m, ttype, h, w)


def fused_rhs(wu, wv, *, ttype: TransformType, tile_h: int = 64,
              interpret: bool = False):
    """r [B,8] alone (quadratic-IC per-iteration path)."""
    b, h, w = wu.shape
    m = weighted_moments(jnp.stack([wu, wv], axis=1), tile_h=tile_h,
                         interpret=interpret)
    return _assemble_b(m, ttype, h, w)
