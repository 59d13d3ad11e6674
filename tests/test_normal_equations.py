"""Normal-equation assembly vs a dense steepest-descent-image oracle.

The oracle materializes DIJ[b,h,w,c,n] = Ix*Jx_n + Iy*Jy_n exactly like the
reference (src/image_optimisation.py:158-194) and contracts it densely
(src/derivatives.py:73-107, src/image_optimisation.py:82-143); the
channel-reduced chunked implementation must match to float tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.normal_equations import (
    RobustLoss,
    grad_moments,
    hessian,
    residual_moments,
    rhs,
    rhop,
    robust_weights,
    solve_normal,
)
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    jacobian_fields,
    nparams,
)

B, H, W, C = 2, 9, 11, 3


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    ix = rng.normal(size=(B, H, W, C))
    iy = rng.normal(size=(B, H, W, C))
    di = rng.normal(size=(B, H, W, C))
    w = rng.uniform(0.1, 2.0, size=(B, H, W))
    return ix, iy, di, w


def dense_dij(ix, iy, jx, jy):
    return ix[..., None] * np.asarray(jx)[None, :, :, None, :] + \
           iy[..., None] * np.asarray(jy)[None, :, :, None, :]


@pytest.mark.parametrize("ttype", [TransformType.TRANSLATION, TransformType.HOMOGRAPHY])
@pytest.mark.parametrize("weighted", [False, True])
def test_hessian_matches_dense_oracle(data, ttype, weighted):
    ix, iy, di, w = data
    jx, jy = jacobian_fields(ttype, H, W, dtype=jnp.float64)
    dij = dense_dij(ix, iy, jx, jy)
    wts = w if weighted else np.ones_like(w)
    exp = np.einsum("bhw,bhwcn,bhwcm->bnm", wts, dij, dij)

    gxx, gxy, gyy = grad_moments(jnp.asarray(ix), jnp.asarray(iy))
    got = hessian(gxx, gxy, gyy, jx, jy,
                  weights=jnp.asarray(w) if weighted else None, chunk=13)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9)


@pytest.mark.parametrize("ttype", [TransformType.EUCLIDEAN, TransformType.HOMOGRAPHY])
@pytest.mark.parametrize("weighted", [False, True])
def test_rhs_matches_dense_oracle(data, ttype, weighted):
    ix, iy, di, w = data
    jx, jy = jacobian_fields(ttype, H, W, dtype=jnp.float64)
    dij = dense_dij(ix, iy, jx, jy)
    wts = w if weighted else np.ones_like(w)
    exp = np.einsum("bhw,bhwcn,bhwc->bn", wts, dij, di)

    u, v = residual_moments(jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(di))
    got = rhs(u, v, jx, jy, weights=jnp.asarray(w) if weighted else None)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9)


def test_rhop_formulas():
    """Vectorized rho' vs the published formulas
    (reference: src/image_optimisation.py:36-51 / tf_image_optimisation.py:20-29)."""
    t2 = jnp.asarray([0.0, 1.0, 25.0, 1e4])
    lam = 5.0
    l2 = 25.0
    np.testing.assert_allclose(np.asarray(rhop(t2, lam, RobustLoss.QUADRATIC)), 1.0)
    np.testing.assert_allclose(
        np.asarray(rhop(t2, lam, RobustLoss.TRUNCATED_QUADRATIC)), [1, 1, 0, 0])
    np.testing.assert_allclose(
        np.asarray(rhop(t2, lam, RobustLoss.GERMAN_MCCLURE)),
        l2 / (l2 + np.asarray(t2)) ** 2, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rhop(t2, lam, RobustLoss.LORENTZIAN)),
        1 / (l2 + np.asarray(t2)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rhop(t2, lam, RobustLoss.CHARBONNIER)),
        1 / np.sqrt(np.asarray(t2) + l2), rtol=1e-6)


def test_robust_weights_channel_sum(data):
    ix, iy, di, w = data
    got = robust_weights(jnp.asarray(di), 5.0, RobustLoss.CHARBONNIER)
    t2 = (di**2).sum(-1)
    np.testing.assert_allclose(np.asarray(got), 1 / np.sqrt(t2 + 25.0), rtol=1e-6)


def test_solve_normal_padded_and_fallback():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 8))
    hfull = np.einsum("bi,bj->bij", a, a) + np.eye(8) * 0.5
    live = np.zeros(8); live[:3] = 1
    # zero out padded rows/cols like a real euclidean system
    hfull[:, 3:, :] = 0.0
    hfull[:, :, 3:] = 0.0
    b = rng.normal(size=(3, 8)); b[:, 3:] = 0.0
    dp, err = solve_normal(jnp.asarray(hfull), jnp.asarray(b), live)
    for i in range(3):
        exp = np.linalg.solve(hfull[i, :3, :3], b[i, :3])
        np.testing.assert_allclose(np.asarray(dp)[i, :3], exp, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dp)[i, 3:], 0.0)
        np.testing.assert_allclose(np.asarray(err)[i], np.linalg.norm(exp), rtol=1e-6)
    # singular system -> dp = 0 (reference fallback src/derivatives.py:126-129)
    hs = np.zeros((1, 8, 8)); bs = np.ones((1, 8))
    dp, err = solve_normal(jnp.asarray(hs), jnp.asarray(bs), live)
    np.testing.assert_allclose(np.asarray(dp), 0.0)


def test_solve_normal_preconditioning_roundtrip():
    """Solving the scaled system must return the same dp as the raw system."""
    rng = np.random.default_rng(2)
    a = rng.normal(size=(2, 8, 8))
    h = np.einsum("bij,bkj->bik", a, a) + np.eye(8)
    b = rng.normal(size=(2, 8))
    live = np.ones(8)
    s = np.array([1, 1, 100, 100, 100, 100, 1e4, 1e4], np.float64)
    hs = h / s[None, :, None] / s[None, None, :]
    bs = b / s[None, :]
    dp_raw, _ = solve_normal(jnp.asarray(h), jnp.asarray(b), live)
    dp_pre, _ = solve_normal(jnp.asarray(hs), jnp.asarray(bs), live, precond=s)
    np.testing.assert_allclose(np.asarray(dp_pre), np.asarray(dp_raw), rtol=1e-8)
