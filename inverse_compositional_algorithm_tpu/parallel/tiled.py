"""Spatial-domain parallelism with explicit collectives (shard_map).

The SP-analogue for image alignment (SURVEY §2.2): row-tiles of the
template image are sharded over the mesh's "tile" axis, each device
computes its partial normal equations, and only the tiny 8x8 system + 8
vector cross the interconnect (`lax.psum` over ICI) per iteration — the
Schur-style layout where images are big but the reduced system is tiny.

Communication pattern per solve:
  * gradient halo — the y central difference needs one neighbor row from
    the adjacent shard; exchanged once with two `lax.ppermute` shifts
    (bicubic's 4x4 stencil never crosses tiles because warping samples the
    *replicated* moving image, see below).
  * per iteration — ONE psum of [B, 8, 8] + [B, 8] partial sums. Nothing
    else moves.

The moving image I2 is replicated across the tile axis: a parametric warp
can fetch pixels from anywhere in the frame (a 10-px translation already
crosses any fixed halo), so tile-locality only exists for the *output*
(template) domain. Replicating I2 (a few MB) buys completely local gathers;
all per-iteration bandwidth — the warp's 16 taps, residual, moments — is
spread over the tile axis.

This is the explicit twin of `parallel.sharded.align_sharded(tile_rows=True)`
(which leaves the partitioning to XLA's SPMD pass); use it when you want
deterministic, inspectable communication or to pin the collective schedule.

The delta-band/boundary semantics use *global* row indices
(ops.gradients docstring; reference boundary logic at
src/keras-tf/tf_inverse_compositional_algorithm.py:19-37 is global too).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.4.35 exports it at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import constants as cts
from ..models.ic import ICState, _masked_residual
from ..ops.normal_equations import (
    RobustLoss,
    grad_moments,
    hessian,
    residual_moments,
    rhs,
    robust_weights,
    solve_normal,
)
from ..ops.transforms import (
    TransformType,
    compose_inverse,
    jacobian_fields,
    nparams,
    pad_params,
    param_preconditioner,
    transform_grid,
)
from ..ops.warp import bicubic_sample, domain_mask
from .mesh import PAIRS_AXIS, TILE_AXIS, Mesh

__all__ = ["tiled_ic_solve", "tiled_pyramidal_solve"]


def _halo_gradients(i1_loc, nt: int, y0, height: int, delta: int,
                    nanifoutside: bool):
    """Central-difference gradients of a row shard with ppermute halos.

    x-gradients are width-local (no communication); the y central
    difference needs the last row of the shard above and the first row of
    the shard below — one ppermute each way. Rows at the *global* border
    are zeroed (matching ops.gradients.central_gradients), and the
    delta-band mask is applied with global coordinates.
    """
    dt = i1_loc.dtype
    b, h_loc, w, c = i1_loc.shape

    ix = 0.5 * (i1_loc[:, :, 2:, :] - i1_loc[:, :, :-2, :])
    ix = jnp.pad(ix, ((0, 0), (0, 0), (1, 1), (0, 0)))

    if nt > 1:
        down = [(i, i + 1) for i in range(nt - 1)]   # send last row downward
        up = [(i + 1, i) for i in range(nt - 1)]     # send first row upward
        top = lax.ppermute(i1_loc[:, -1:, :, :], TILE_AXIS, down)
        bot = lax.ppermute(i1_loc[:, :1, :, :], TILE_AXIS, up)
    else:
        top = jnp.zeros_like(i1_loc[:, :1])
        bot = jnp.zeros_like(i1_loc[:, :1])
    above = jnp.concatenate([top, i1_loc[:, :-1]], axis=1)
    below = jnp.concatenate([i1_loc[:, 1:], bot], axis=1)
    iy = 0.5 * (below - above)

    rows = jnp.arange(h_loc) + y0                    # global row indices
    interior = ((rows >= 1) & (rows <= height - 2)).astype(dt)
    iy = iy * interior[None, :, None, None]

    if nanifoutside and delta > 0:
        cols = np.arange(w)
        cok = jnp.asarray(((cols >= delta) & (cols < w - delta))
                          .astype(np.float32), dt)
        rok = ((rows >= delta) & (rows < height - delta)).astype(dt)
        band = rok[:, None] * cok[None, :]
        ix = ix * band[None, :, :, None]
        iy = iy * band[None, :, :, None]
    return ix, iy


@lru_cache(maxsize=128)
def _build_tiled_fn(
    ttype: TransformType,
    mesh: Mesh,
    tol: float,
    max_iter: int,
    robust: RobustLoss,
    lam: float,
    nanifoutside: bool,
    delta: int,
    precondition: bool,
    hessian_chunk: int,
    shape: tuple,
    dtype_name: str,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Build + jit the shard_map program for one static configuration.

    Cached on every static argument (jit keys on function identity, so a
    fresh closure per call would retrace/recompile each solve — these
    programs can take minutes to compile on TPU)."""
    from ..models.ic import effective_delta

    bsz, hh, ww, _ = shape
    dt = jnp.dtype(dtype_name)
    nt = mesh.shape[TILE_AXIS]
    h_loc = hh // nt
    delta = effective_delta(delta, hh, ww)   # same cap as models.ic
    is_robust = robust is not RobustLoss.QUADRATIC
    scale = param_preconditioner(ttype, hh, ww) if precondition else None
    live = np.zeros(cts.NPARAMS_MAX, np.float32)
    live[: nparams(ttype)] = 1.0
    lam0 = lam if lam > 0 else cts.LAMBDA_0

    # Pallas tile-warp inside shard_map: each device warps only its local
    # output rows (gx/gy carry the global y_offset) while sampling the
    # replicated full moving image — the kernel signature already separates
    # output-grid dims from source clip bounds (ops/pallas/warp.py).
    pallas_mode = None
    if use_pallas:
        from ..ops.pallas.warp import pad_planar, plan_warp_mode

        pallas_mode = plan_warp_mode(hh, ww, shape[3], jnp.dtype(dtype_name))

    def shard_fn(i1_loc, i2_full, p0_loc):
        y0 = lax.axis_index(TILE_AXIS) * h_loc
        b_loc = i1_loc.shape[0]
        i2p = pad_planar(i2_full) if pallas_mode else None

        ix, iy = _halo_gradients(i1_loc, nt, y0, hh, delta, nanifoutside)
        gxx, gxy, gyy = grad_moments(ix, iy)
        jx, jy = jacobian_fields(ttype, h_loc, ww, dtype=dt, scale=scale,
                                 y_offset=y0)

        h_quad = None
        if not is_robust:
            h_quad = lax.psum(
                hessian(gxx, gxy, gyy, jx, jy, chunk=hessian_chunk),
                TILE_AXIS)

        def body(s):
            gx, gy = transform_grid(s.p, ttype, h_loc, ww, y_offset=y0)
            if pallas_mode:
                from ..ops.pallas.warp import pallas_warp_planar

                iw = pallas_warp_planar(
                    i2p, gx, gy, hh, ww, interpret=interpret,
                    stream=(pallas_mode == "stream")).transpose(0, 2, 3, 1)
            else:
                iw = bicubic_sample(i2_full, gx, gy)
            valid = domain_mask(gx, gy, hh, ww, delta)
            di = _masked_residual(iw, valid, i1_loc, nanifoutside)

            if is_robust:
                rho = robust_weights(di, s.lam, robust)
                lam_next = jnp.where(
                    s.lam > cts.LAMBDA_N,
                    jnp.maximum(s.lam * cts.LAMBDA_RATIO, cts.LAMBDA_N),
                    s.lam) if lam <= 0 else s.lam
                h = lax.psum(
                    hessian(gxx, gxy, gyy, jx, jy, weights=rho,
                            chunk=hessian_chunk), TILE_AXIS)
            else:
                rho, lam_next, h = None, s.lam, h_quad

            u, v = residual_moments(ix, iy, di)
            b = lax.psum(rhs(u, v, jx, jy, weights=rho), TILE_AXIS)
            dp, err = solve_normal(h, b, live, precond=scale)

            p_new = compose_inverse(s.p, pad_params(dp), ttype)
            act = s.active
            p = jnp.where(act[:, None], p_new, s.p)
            error = jnp.where(act, err, s.error)
            niters = s.niters + act.astype(s.niters.dtype)
            still = act & (err > tol) & (s.it + 1 < max_iter)
            return ICState(p=p, error=error, lam=lam_next, it=s.it + 1,
                           niters=niters, active=still, diverged=s.diverged)

        # Variance-checked shard_map: per-pair carries start with the
        # pairs-varying type the loop body produces. (With use_pallas the
        # program runs check_vma=False — pallas_call outputs carry no vma
        # type — so pcast degenerates to identity there.)
        if pallas_mode:
            vary = lambda x: x
        else:
            vary = lambda x: jax.lax.pcast(x, PAIRS_AXIS, to="varying")
        init = ICState(
            p=pad_params(jnp.asarray(p0_loc, dt)),
            error=vary(jnp.full((b_loc,), 1e10, dt)),
            lam=jnp.asarray(lam0, dt),
            it=jnp.asarray(0, jnp.int32),
            niters=vary(jnp.zeros((b_loc,), jnp.int32)),
            active=vary(jnp.ones((b_loc,), bool)),
            diverged=vary(jnp.zeros((b_loc,), bool)),
        )
        s = lax.while_loop(lambda s: jnp.any(s.active), body, init)
        # Each pairs-shard runs its own while_loop trip count, so the
        # scalar it/lam diverge across the pairs axis. Reduce them to
        # well-defined, replicated diagnostics: the max trip count and the
        # matching (most-annealed, i.e. minimum) lambda.
        return ICState(p=s.p, error=s.error,
                       lam=lax.pmin(s.lam, PAIRS_AXIS),
                       it=lax.pmax(s.it, PAIRS_AXIS),
                       niters=s.niters, active=s.active, diverged=s.diverged)

    pp = P(PAIRS_AXIS)
    state_specs = ICState(p=pp, error=pp, lam=P(), it=P(), niters=pp,
                          active=pp, diverged=pp)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(PAIRS_AXIS, TILE_AXIS), P(PAIRS_AXIS), pp),
        out_specs=state_specs,
        check_vma=not pallas_mode,
    )
    return jax.jit(fn)


def tiled_ic_solve(
    i1,
    i2,
    p0,
    ttype: TransformType,
    *,
    mesh: Mesh,
    tol: float = 1e-3,
    max_iter: int = cts.MAX_ITER,
    robust: RobustLoss = RobustLoss.QUADRATIC,
    lam: float = 0.0,
    nanifoutside: bool = True,
    delta: int = 10,
    precondition: bool = True,
    hessian_chunk: int = 16384,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Single-scale IC/IRLS solve, row-tiled over mesh axis "tile" and
    batch-sharded over "pairs". Numerically equivalent to models.ic.ic_solve
    up to float summation order. The compiled program is cached per
    (config, mesh, shape, dtype) — repeated solves pay compile cost once.

    Args:
      i1, i2: [B, H, W, C]; B divisible by the pairs axis, H by the tile
        axis. p0: [B, 8].
      use_pallas: warp each device's local row shard with the Pallas tile
        kernel (Mosaic under shard_map) instead of the XLA gather sampler;
        interpret runs that kernel in the Pallas interpreter (CPU lanes).

    Returns:
      ICState (p/error/niters sharded over pairs; it/lam are replicated
      global diagnostics: max trip count / min lambda across pair shards).
    """
    bsz, hh, ww, _ = i1.shape
    dt = i1.dtype
    nt = mesh.shape[TILE_AXIS]
    npair = mesh.shape[PAIRS_AXIS]
    if hh % nt:
        raise ValueError(f"H={hh} not divisible by tile axis size {nt}")
    if bsz % npair:
        raise ValueError(f"B={bsz} not divisible by pairs axis size {npair}")
    fn = _build_tiled_fn(ttype, mesh, float(tol), int(max_iter), robust,
                         float(lam), bool(nanifoutside), int(delta),
                         bool(precondition), int(hessian_chunk),
                         tuple(i1.shape), jnp.dtype(dt).name,
                         bool(use_pallas), bool(interpret))
    return fn(i1, i2, pad_params(jnp.asarray(p0, dt)))


def tiled_pyramidal_solve(
    i1,
    i2,
    p0,
    ttype: TransformType,
    *,
    mesh: Mesh,
    nscales: int = 5,
    nu: float = 0.5,
    tol: float = 1e-3,
    max_iter: int = cts.MAX_ITER,
    robust: RobustLoss = RobustLoss.QUADRATIC,
    lam: float = 0.0,
    nanifoutside: bool = True,
    delta: int = 10,
    pyramid_method: str = "ipol",
    precondition: bool = True,
    hessian_chunk: int = 16384,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Coarse-to-fine pyramid over the explicitly-tiled SP solver.

    Semantics of models.pyramidal.pyramidal_solve, with each level solved
    by `tiled_ic_solve` when its height divides the tile axis — the big,
    expensive levels, which is where spatial sharding pays — and by the
    single-device-semantics `models.ic.ic_solve` otherwise (tiny coarse
    levels whose odd heights don't split; their cost is negligible and
    XLA's SPMD partitioner still shards them over pairs). Parameters are
    rescaled between levels exactly like the reference driver
    (src/inverse_compositional_algorithm.py:340-372).

    Returns (state, per_scale) like pyramidal_solve.
    """
    from ..models.ic import ic_solve
    from ..ops.pyramid import build_pyramid, pyramid_shapes
    from ..ops.transforms import zoom_in_params

    _, hh, ww, _ = i1.shape
    nt = mesh.shape[TILE_AXIS]
    shapes = pyramid_shapes(hh, ww, nscales, nu)
    pyr1 = build_pyramid(i1, nscales, nu, pyramid_method)
    pyr2 = build_pyramid(i2, nscales, nu, pyramid_method)

    p = pad_params(jnp.asarray(p0, i1.dtype))
    for s in range(1, nscales):
        (fh, fw), (ch, cw) = shapes[s - 1], shapes[s]
        p = zoom_in_params(p, ttype, fw, fh, cw, ch)

    per_scale = []
    state = None
    kw = dict(tol=tol, max_iter=max_iter, robust=robust, lam=lam,
              nanifoutside=nanifoutside, delta=delta,
              precondition=precondition, hessian_chunk=hessian_chunk)
    for s in range(nscales - 1, -1, -1):
        lh = shapes[s][0]
        if lh % nt == 0:
            state = tiled_ic_solve(pyr1[s], pyr2[s], p, ttype, mesh=mesh,
                                   use_pallas=use_pallas,
                                   interpret=interpret, **kw)
        else:
            state = ic_solve(pyr1[s], pyr2[s], p, ttype,
                             use_pallas=use_pallas, interpret=interpret,
                             **kw)
        per_scale.append(state)
        if s > 0:
            (fh, fw), (ch, cw) = shapes[s - 1], shapes[s]
            p = zoom_in_params(state.p, ttype, cw, ch, fw, fh)
    return state, per_scale
