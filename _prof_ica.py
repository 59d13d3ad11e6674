"""Stage-level TPU profile using on-device scans (RTT-cancelled two-point)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from inverse_compositional_algorithm_tpu.utils.profiling import enable_compilation_cache
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType, pad_params, transform_grid, jacobian_fields,
    param_preconditioner, compose_inverse, nparams)
from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample
from inverse_compositional_algorithm_tpu.ops.pallas.warp import (
    pad_planar, plan_fast_warp, warp_image_fast, pallas_warp_planar)
from inverse_compositional_algorithm_tpu.ops.gradients import central_gradients, boundary_band_mask
from inverse_compositional_algorithm_tpu.ops.normal_equations import (
    RobustLoss, grad_moments, residual_moments, robust_weights, solve_normal)
from inverse_compositional_algorithm_tpu.ops.pallas.normal_eq import fused_normal_eq
from inverse_compositional_algorithm_tpu.ops.pyramid import build_pyramid, gaussian_blur
from inverse_compositional_algorithm_tpu.models.ic import ic_solve, _masked_residual

enable_compilation_cache()

B, H, W = 16, 388, 584
TT = TransformType.HOMOGRAPHY
HB = plan_fast_warp(H, W, 3, jnp.float32)
print("fast warp hb:", HB, flush=True)

t_imp = time.perf_counter()


@jax.jit
def setup(noise, p0r):
    img = gaussian_blur(noise[None], 2.0)[0]
    p0 = pad_params(p0r)
    gx, gy = transform_grid(p0, TT, H, W)
    i2 = jnp.broadcast_to(img[None], (B, H, W, 3))
    i1 = bicubic_sample(i2, gx, gy)
    i2p = pad_planar(i2)
    ix, iy = central_gradients(i1)
    band = boundary_band_mask(H, W, 10).astype(jnp.float32)[None, :, :, None]
    ix = ix * band
    iy = iy * band
    gxx, gxy, gyy = grad_moments(ix, iy)
    iw = bicubic_sample(i2, gx, gy)
    valid = (gx >= 10) & (gx <= W - 11) & (gy >= 10) & (gy <= H - 11)
    di = _masked_residual(iw, valid, i1, True)
    rho = robust_weights(di, 5.0, RobustLoss.CHARBONNIER)
    u, v = residual_moments(ix, iy, di)
    h8, b8 = fused_normal_eq(rho * gxx, rho * gxy, rho * gyy, rho * u,
                             rho * v, ttype=TT)
    return dict(i1=i1, i2=i2, i2p=i2p, p0=p0, gx=gx, gy=gy, ix=ix, iy=iy,
                gxx=gxx, gxy=gxy, gyy=gyy, di=di, rho=rho, u=u, v=v,
                h8=h8, b8=b8)


rng = np.random.default_rng(0)
noise = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
p0r = jnp.asarray(rng.uniform(-1e-3, 1e-3, (B, 8)), jnp.float32)
env = jax.block_until_ready(setup(noise, p0r))
print(f"setup done in {time.perf_counter() - t_imp:.1f}s", flush=True)

eps = 1e-12


def timed(name, fn, args, K=8, K0=2):
    @partial(jax.jit, static_argnames=("k",))
    def scan_k(args, k):
        def step(acc, _):
            return fn(acc, *args), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=k)
        return acc

    t_c = time.perf_counter()
    float(scan_k(args, K0))
    float(scan_k(args, K))
    t0 = time.perf_counter()
    float(scan_k(args, K0))
    t1 = time.perf_counter()
    float(scan_k(args, K))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / (K - K0) * 1e3
    print(f"{name:44s} {ms:9.3f} ms   (compile+warm {t0 - t_c:.1f}s)",
          flush=True)
    return ms


e = env

timed("transform_grid", lambda acc, p: (lambda gg: acc + gg[0][0, 0, 0] + gg[1][0, 0, 0])(
    transform_grid(p + acc * eps, TT, H, W)), (e["p0"],))

timed("pallas_warp_planar", lambda acc, i2p, gx, gy: acc + pallas_warp_planar(
    i2p, gx + acc * eps, gy, H, W, hb=HB)[0, 0, 0, 0], (e["i2p"], e["gx"], e["gy"]))

timed("warp_image_fast (checked)", lambda acc, i2, i2p, gx, gy: acc + warp_image_fast(
    i2, i2p, gx + acc * eps, gy, 10, HB)[0][0, 0, 0, 0],
    (e["i2"], e["i2p"], e["gx"], e["gy"]))

timed("bicubic_sample (XLA gather)", lambda acc, i2, gx, gy: acc + bicubic_sample(
    i2, gx + acc * eps, gy)[0, 0, 0, 0], (e["i2"], e["gx"], e["gy"]), K=4, K0=1)

timed("masked_residual+robust_weights", lambda acc, di, i1: acc + robust_weights(
    _masked_residual(di + acc * eps, (di[..., 0] > -1e9), i1, True), 5.0,
    RobustLoss.CHARBONNIER)[0, 0, 0], (e["di"], e["i1"]))

timed("residual_moments", lambda acc, ix, iy, di: acc + sum(
    m[0, 0, 0] for m in residual_moments(ix, iy, di + acc * eps)),
    (e["ix"], e["iy"], e["di"]))

timed("rho-mult + fused_normal_eq", lambda acc, gxx, gxy, gyy, u, v, rho: (
    lambda hb_: acc + hb_[0][0, 0, 0] + hb_[1][0, 0])(
    fused_normal_eq(rho * gxx, rho * (gxy + acc * eps), rho * gyy,
                    rho * u, rho * v, ttype=TT)),
    (e["gxx"], e["gxy"], e["gyy"], e["u"], e["v"], e["rho"]))

live = np.zeros(8, np.float32)
live[: nparams(TT)] = 1.0
scale = param_preconditioner(TT, H, W)

timed("solve + compose", lambda acc, h8, b8, p0: (
    lambda dpr: acc + compose_inverse(p0, pad_params(dpr[0]), TT)[0, 0] + dpr[1][0])(
    solve_normal(h8 + acc * eps, b8, live, precond=scale)),
    (e["h8"], e["b8"], e["p0"]))

timed("build_pyramid (5 scales, ipol)", lambda acc, i1: acc + sum(
    l[0, 0, 0, 0] for l in build_pyramid(i1 + acc * eps, 5, 0.5, "ipol")),
    (e["i1"],), K=4, K0=1)


def f_full(acc, i1, i2, p0):
    s = ic_solve(i1, i2 + acc * eps, p0, TT, robust=RobustLoss.CHARBONNIER,
                 use_pallas=True)
    return acc + s.p.sum() + s.error.sum()


timed("ic_solve finest (robust, pallas)", f_full, (e["i1"], e["i2"], e["p0"]),
      K=4, K0=1)
