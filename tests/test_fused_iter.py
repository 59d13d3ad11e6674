"""Fully-fused iteration kernel vs the separate-op pipeline (its oracle).

Runs in Pallas interpreter mode on CPU; the TPU lowering is exercised by
bench/driver runs. The oracle is the exact op chain the kernel replaces:
warp -> masked residual -> robust weights -> channel-reduced moments ->
preconditioned normal equations (ops/normal_equations with the L-scaled
Jacobian of ops.transforms.param_preconditioner).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.models.ic import _masked_residual
from inverse_compositional_algorithm_tpu.ops.gradients import (
    boundary_band_mask,
    central_gradients,
)
from inverse_compositional_algorithm_tpu.ops.normal_equations import (
    RobustLoss,
    grad_moments,
    hessian,
    residual_moments,
    rhs,
    robust_weights,
)
from inverse_compositional_algorithm_tpu.ops.pallas.fused_iter import (
    fused_iter_moments,
    plan_fused_iter,
)
from inverse_compositional_algorithm_tpu.ops.pallas.normal_eq import (
    _assemble_b,
    _assemble_h,
)
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    jacobian_fields,
    pad_params,
    param_preconditioner,
    transform_grid,
)
from inverse_compositional_algorithm_tpu.ops.warp import (
    bicubic_sample,
    domain_mask,
)


def _setup(ttype, p, b=2, h=37, w=53, c=3, delta=4, seed=0):
    rng = np.random.default_rng(seed)
    i2 = jnp.asarray(rng.uniform(0, 255, (b, h, w, c)), jnp.float32)
    i1 = jnp.asarray(rng.uniform(0, 255, (b, h, w, c)), jnp.float32)
    pp = jnp.broadcast_to(pad_params(jnp.asarray(p, jnp.float32), ttype),
                          (b, 8))
    ix, iy = central_gradients(i1)
    band = boundary_band_mask(h, w, delta).astype(jnp.float32)[None, ..., None]
    ix = ix * band
    iy = iy * band
    gxx, gxy, gyy = grad_moments(ix, iy)
    gx, gy = transform_grid(pp, ttype, h, w)
    plan = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy, robust=True)
    assert plan is not None
    return dict(i1=i1, i2=i2, ix=ix, iy=iy, gxx=gxx, gxy=gxy, gyy=gyy,
                gx=gx, gy=gy, plan=plan, h=h, w=w, delta=delta, ttype=ttype)


def _oracle(e, robust, lam, nanifoutside=True):
    iw = bicubic_sample(e["i2"], e["gx"], e["gy"])
    valid = domain_mask(e["gx"], e["gy"], e["h"], e["w"], e["delta"])
    di = _masked_residual(iw, valid, e["i1"], nanifoutside)
    scale = param_preconditioner(e["ttype"], e["h"], e["w"])
    jx, jy = jacobian_fields(e["ttype"], e["h"], e["w"], dtype=jnp.float32,
                             scale=scale)
    rho = (robust_weights(di, lam, robust) if robust is not None else None)
    u, v = residual_moments(e["ix"], e["iy"], di)
    hm = hessian(e["gxx"], e["gxy"], e["gyy"], jx, jy, weights=rho)
    bv = rhs(u, v, jx, jy, weights=rho)
    return hm, bv


def _fused(e, robust, lam, nanifoutside=True):
    # A robust-packed plan (P = 3C+3) also serves the quadratic path (the
    # 3 moment planes stream but are unread).
    p = e["plan"]
    m = fused_iter_moments(p.i2p, p.tplp,
                           e["gx"], e["gy"], jnp.float32(lam),
                           height=e["h"], width=e["w"], robust=robust,
                           nanifoutside=nanifoutside, delta=e["delta"],
                           interpret=True)
    if robust is not None:
        return (_assemble_h(m[:, :3], e["ttype"], e["h"], e["w"]),
                _assemble_b(m[:, 3:], e["ttype"], e["h"], e["w"]))
    return None, _assemble_b(m, e["ttype"], e["h"], e["w"])


CASES = [
    (TransformType.TRANSLATION, [3.25, -2.5]),
    (TransformType.EUCLIDEAN, [1.5, -0.5, 0.05]),
    (TransformType.AFFINITY, [1.0, -1.0, 0.05, -0.02, 0.03, -0.04]),
    (TransformType.HOMOGRAPHY,
     [0.02, -0.01, 2.0, 0.015, -0.02, -1.5, 1e-4, -5e-5]),
]


@pytest.mark.parametrize("ttype,p", CASES)
def test_robust_matches_pipeline(ttype, p):
    e = _setup(ttype, p)
    h_ref, b_ref = _oracle(e, RobustLoss.CHARBONNIER, 5.0)
    h_got, b_got = _fused(e, RobustLoss.CHARBONNIER, 5.0)
    hn = max(1.0, float(np.abs(np.asarray(h_ref)).max()))
    bn = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(h_got) / hn, np.asarray(h_ref) / hn,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(b_got) / bn, np.asarray(b_ref) / bn,
                               atol=2e-4)


@pytest.mark.parametrize("loss", [RobustLoss.TRUNCATED_QUADRATIC,
                                  RobustLoss.GERMAN_MCCLURE,
                                  RobustLoss.LORENTZIAN])
def test_other_losses(loss):
    e = _setup(TransformType.EUCLIDEAN, [1.5, -0.5, 0.05], seed=3)
    h_ref, b_ref = _oracle(e, loss, 17.0)
    h_got, b_got = _fused(e, loss, 17.0)
    hn = max(1.0, float(np.abs(np.asarray(h_ref)).max()))
    np.testing.assert_allclose(np.asarray(h_got) / hn, np.asarray(h_ref) / hn,
                               atol=2e-4)


def test_quadratic_rhs_matches():
    e = _setup(TransformType.HOMOGRAPHY,
               [0.02, -0.01, 2.0, 0.015, -0.02, -1.5, 1e-4, -5e-5], seed=1)
    _, b_ref = _oracle(e, None, 0.0)
    _, b_got = _fused(e, None, 0.0)
    bn = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(b_got) / bn, np.asarray(b_ref) / bn,
                               atol=2e-4)


def test_nanifoutside_false():
    e = _setup(TransformType.TRANSLATION, [9.0, -7.0], seed=2)
    h_ref, b_ref = _oracle(e, RobustLoss.CHARBONNIER, 5.0, nanifoutside=False)
    h_got, b_got = _fused(e, RobustLoss.CHARBONNIER, 5.0, nanifoutside=False)
    hn = max(1.0, float(np.abs(np.asarray(h_ref)).max()))
    bn = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(h_got) / hn, np.asarray(h_ref) / hn,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(b_got) / bn, np.asarray(b_ref) / bn,
                               atol=2e-4)


def test_extreme_rotation_moments_match():
    """A ~69-degree rotation (many y-segments per row) must still produce
    the exact normal equations — no fallback path exists anymore."""
    e = _setup(TransformType.EUCLIDEAN, [0.0, 0.0, 1.2], h=64, w=200)
    h_ref, b_ref = _oracle(e, RobustLoss.CHARBONNIER, 5.0)
    h_got, b_got = _fused(e, RobustLoss.CHARBONNIER, 5.0)
    hn = max(1.0, float(np.abs(np.asarray(h_ref)).max()))
    bn = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(np.asarray(h_got) / hn, np.asarray(h_ref) / hn,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(b_got) / bn, np.asarray(b_ref) / bn,
                               atol=2e-4)


def _synthetic_pair(b=1, h=48, w=64, gt=(1.5, -1.0)):
    from inverse_compositional_algorithm_tpu.ops.pyramid import gaussian_blur

    rng = np.random.default_rng(0)
    img = gaussian_blur(jnp.asarray(
        rng.uniform(0, 255, (b, h, w, 3)), jnp.float32), 2.0)
    p = pad_params(jnp.broadcast_to(jnp.asarray(gt, jnp.float32), (b, 2)))
    gx, gy = transform_grid(p, TransformType.TRANSLATION, h, w)
    i1 = bicubic_sample(img, gx, gy)
    return i1, img


@pytest.mark.parametrize("robust", [RobustLoss.QUADRATIC,
                                    RobustLoss.CHARBONNIER])
def test_solver_fused_branch_matches_xla(robust):
    """ic_solve's use_pallas branch (fused_iter_moments + moment assembly,
    models/ic.py body()) runs via the Pallas interpreter and must converge
    to the same parameters as the XLA path. (The tile warp is exact for
    arbitrary motion — fast vs general per-tile paths differ only in cost.)
    This is the fused-solver coverage round 2 lacked (ADVICE r2, medium)."""
    from inverse_compositional_algorithm_tpu.models.ic import ic_solve

    i1, i2 = _synthetic_pair()
    p0 = jnp.zeros((1, 8), jnp.float32)
    s_xla = ic_solve(i1, i2, p0, TransformType.TRANSLATION, delta=3,
                     robust=robust, use_pallas=False)
    s_pal = ic_solve(i1, i2, p0, TransformType.TRANSLATION, delta=3,
                     robust=robust, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(s_pal.p[0, :2]), [1.5, -1.0],
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(s_pal.p), np.asarray(s_xla.p),
                               atol=1e-4)
    assert int(s_pal.niters[0]) == int(s_xla.niters[0])


def test_align_interpret_pallas_end_to_end():
    """Full align() with use_pallas + interpret exercises the fused solver,
    the Pallas final warp, and the pyramid on CPU."""
    import inverse_compositional_algorithm_tpu as ica

    i1, i2 = _synthetic_pair(h=64, w=96, gt=(2.5, -1.5))
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=2,
                          robust=RobustLoss.CHARBONNIER, delta=3,
                          use_pallas=True, interpret=True)
    res = ica.align(i1, i2, cfg)
    np.testing.assert_allclose(np.asarray(res.p[0, :2]), [2.5, -1.5],
                               atol=1e-2)
