"""Stage-level device profile of the alignment pipeline.

Times every pipeline stage (and the fused Pallas kernels) with on-device
scans using the same RTT-cancelled two-point methodology as
eval/benchmarks.py, on a *realistic* motion distribution (the bench
workload's ±3 px / ±2/L homographies — NOT large random perspective
params, which would send most tiles down the exact-but-slower per-row
segment path of the tile warp and profile that instead of the shared-
gather fast path the steady state actually runs).

Run:  python -m inverse_compositional_algorithm_tpu.eval.profile_stages
Produces the stage table plus an HBM-roofline line for the fused
iteration kernel (see also eval/benchmarks.py's roofline accounting).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.ic import _masked_residual, ic_solve
from ..ops.gradients import boundary_band_mask, central_gradients
from ..ops.normal_equations import (
    RobustLoss,
    grad_moments,
    residual_moments,
    robust_weights,
)
from ..ops.pallas.fused_iter import fused_iter_moments, plan_fused_iter
from ..ops.pallas.normal_eq import fused_normal_eq
from ..ops.pallas.warp import pallas_warp_planar, plan_fast_warp, warp_image_fast
from ..ops.pyramid import build_pyramid
from ..ops.transforms import TransformType, pad_params, transform_grid
from ..ops.warp import bicubic_sample
from .benchmarks import make_bench_batch

__all__ = ["profile_stages", "timed_scan"]


def timed_scan(fn, args, k: int = 8, k0: int = 2) -> float:
    """Milliseconds per call of `fn(carry, *args) -> carry`, measured as the
    two-point difference between k- and k0-step on-device scans."""

    @partial(jax.jit, static_argnames=("n",))
    def scan_n(args, n):
        def step(acc, _):
            return fn(acc, *args), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return acc

    float(scan_n(args, k0))
    float(scan_n(args, k))
    t0 = time.perf_counter()
    float(scan_n(args, k0))
    t1 = time.perf_counter()
    float(scan_n(args, k))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k - k0) * 1e3


def profile_stages(batch: int = 16, height: int = 388, width: int = 584,
                   ttype: TransformType = TransformType.HOMOGRAPHY,
                   robust: RobustLoss = RobustLoss.CHARBONNIER) -> dict:
    """Measure each stage; returns {stage: ms} and prints a table."""
    eps = 1e-12
    i1, i2, p_gt = make_bench_batch(batch, height, width, ttype)
    p0 = pad_params(jnp.asarray(p_gt))          # warp at the gt motion: the
    gx, gy = transform_grid(p0, ttype, height, width)   # realistic hot state

    ix, iy = central_gradients(i1)
    band = boundary_band_mask(height, width, 10).astype(jnp.float32)
    ix = ix * band[None, :, :, None]
    iy = iy * band[None, :, :, None]
    gxx, gxy, gyy = grad_moments(ix, iy)
    plan = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy, robust=True)
    assert plan is not None
    lam = jnp.float32(5.0)

    results: dict[str, float] = {}

    def add(name, fn, args, **kw):
        ms = timed_scan(fn, args, **kw)
        results[name] = ms
        print(f"{name:46s} {ms:9.3f} ms", flush=True)
        return ms

    add("transform_grid",
        lambda acc, p: acc + sum(
            g[0, 0, 0] for g in transform_grid(p + acc * eps, ttype,
                                               height, width)),
        (p0,))

    add("pallas_warp_planar",
        lambda acc, ip, gx, gy: acc + pallas_warp_planar(
            ip, gx + acc * eps, gy, height, width)[0, 0, 0, 0],
        (plan.i2p, gx, gy))

    add("warp_image_fast (checked, sane motion)",
        lambda acc, i2, ip, gx, gy: acc + warp_image_fast(
            i2, ip, gx + acc * eps, gy, 10)[0][0, 0, 0, 0],
        (i2, plan.i2p, gx, gy))

    add("fused_iter_moments (robust)",
        lambda acc, gx, gy: acc + fused_iter_moments(
            plan.i2p, plan.tplp,
            gx + acc * eps, gy, lam, height=height, width=width,
            robust=robust, nanifoutside=True, delta=10).sum(),
        (gx, gy))

    plan_q = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy, robust=False)
    add("fused_iter_moments (quadratic)",
        lambda acc, gx, gy: acc + fused_iter_moments(
            plan_q.i2p, plan_q.tplp,
            gx + acc * eps, gy, lam, height=height, width=width,
            robust=None, nanifoutside=True, delta=10).sum(),
        (gx, gy))

    add("bicubic_sample (XLA gather fallback)",
        lambda acc, i2, gx, gy: acc + bicubic_sample(
            i2, gx + acc * eps, gy)[0, 0, 0, 0],
        (i2, gx, gy), k=3, k0=1)

    iw = bicubic_sample(i2, gx, gy)
    valid = (gx >= 10) & (gx <= width - 11) & (gy >= 10) & (gy <= height - 11)
    di = _masked_residual(iw, valid, i1, True)

    add("residual+rho+moments+normal_eq (XLA chain)",
        lambda acc, iw, i1, ix, iy: (lambda di: (lambda rho, uv: acc + sum(
            t.sum() for t in fused_normal_eq(
                rho * gxx, rho * gxy, rho * gyy, rho * uv[0], rho * uv[1],
                ttype=ttype)))(
            robust_weights(di, 5.0, robust), residual_moments(ix, iy, di)))(
            _masked_residual(iw + acc * eps, valid, i1, True)),
        (iw, i1, ix, iy))

    add("build_pyramid (5 scales, ipol)",
        lambda acc, i1: acc + sum(
            l[0, 0, 0, 0] for l in build_pyramid(i1 + acc * eps, 5, 0.5,
                                                 "ipol")),
        (i1,), k=4, k0=1)

    add("ic_solve finest (robust, pallas)",
        lambda acc, i1, i2, p: (lambda s: acc + s.p.sum() + s.error.sum())(
            ic_solve(i1, i2 + acc * eps, p, ttype, robust=robust,
                     use_pallas=True)),
        (i1, i2, jnp.zeros_like(p0)), k=4, k0=1)

    add("ic_solve finest (robust, XLA)",
        lambda acc, i1, i2, p: (lambda s: acc + s.p.sum() + s.error.sum())(
            ic_solve(i1, i2 + acc * eps, p, ttype, robust=robust,
                     use_pallas=False)),
        (i1, i2, jnp.zeros_like(p0)), k=3, k0=1)

    # HBM roofline for the fused iteration: bytes each kernel instance must
    # move (planar image resident per pair + per-tile operand planes).
    b, c, hp8, wp = plan.i2p.shape
    nplanes = 3 * c + 3          # i1p/ixp/iyp tiles + g3p (robust)
    bytes_per_pair = (c * hp8 * wp            # i2p, fetched once
                      + nplanes * hp8 * wp    # per-tile streamed planes
                      + 2 * height * width    # gx, gy
                      ) * 4
    ms = results.get("fused_iter_moments (robust)", float("nan"))
    gbs = bytes_per_pair * batch / (ms * 1e-3) / 1e9
    print(f"\nfused iter HBM traffic ~{bytes_per_pair * batch / 1e6:.0f} MB"
          f"/batch -> {gbs:.0f} GB/s achieved "
          f"({gbs / 8.19:.1f}% of v5e 819 GB/s peak)", flush=True)
    results["fused_iter_gbs"] = gbs
    return results


def profile_large_frame(batch: int = 4, height: int = 720,
                        width: int = 1280) -> dict:
    """Stage times for the 720p streaming mode (plan_warp_mode=="stream"):
    the streaming fused kernel and streaming standalone warp, plus the
    resident kernel at a half-size shape for a per-pixel comparison."""
    from ..ops.pallas.warp import plan_warp_mode

    eps = 1e-12
    ttype = TransformType.HOMOGRAPHY
    mode = plan_warp_mode(height, width, 3, jnp.float32)
    print(f"plan_warp_mode({height}x{width}) = {mode}")
    i1, i2, p_gt = make_bench_batch(batch, height, width, ttype)
    p0 = pad_params(jnp.asarray(p_gt))
    gx, gy = transform_grid(p0, ttype, height, width)
    ix, iy = central_gradients(i1)
    band = boundary_band_mask(height, width, 10).astype(jnp.float32)
    ix = ix * band[None, :, :, None]
    iy = iy * band[None, :, :, None]
    gxx, gxy, gyy = grad_moments(ix, iy)
    plan = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy, robust=True)
    lam = jnp.float32(5.0)
    results: dict[str, float] = {}

    def add(name, fn, args, **kw):
        ms = timed_scan(fn, args, **kw)
        results[name] = ms
        print(f"{name:46s} {ms:9.3f} ms", flush=True)

    add(f"fused_iter_moments stream ({width}x{height})",
        lambda acc, gx, gy: acc + fused_iter_moments(
            plan.i2p, plan.tplp,
            gx + acc * eps, gy, lam, height=height, width=width,
            robust=RobustLoss.CHARBONNIER, nanifoutside=True, delta=10,
            stream=plan.stream).sum(),
        (gx, gy))
    add(f"pallas_warp_planar stream ({width}x{height})",
        lambda acc, ip, gx, gy: acc + pallas_warp_planar(
            ip, gx + acc * eps, gy, height, width,
            stream=plan.stream)[0, 0, 0, 0],
        (plan.i2p, gx, gy))
    return results


if __name__ == "__main__":
    import sys

    from ..utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if "--large" in sys.argv:
        profile_large_frame()
    else:
        profile_stages()
