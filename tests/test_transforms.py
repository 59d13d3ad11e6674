"""Geometry core unit tests: parameterization, composition algebra, grids.

Oracle strategy: the IC composition must satisfy, by construction,
M(compose(p, dp)) ∝ M(p) @ M(dp)^{-1} — we verify that identity in float64
for random parameters of every model, plus closed-form special cases the
reference documents (translation p-dp, self-composition = identity).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    compose_inverse,
    invert_params,
    jacobian_fields,
    matrix_to_params,
    nparams,
    pad_params,
    param_preconditioner,
    params_to_matrix,
    transform_grid,
    zoom_in_params,
)

ALL_TYPES = list(TransformType)


def rand_params(ttype, rng, scale=0.1):
    k = nparams(ttype)
    p = rng.normal(0, scale, k)
    p[:2] = rng.normal(0, 5.0, 2)  # translations can be large
    if ttype is TransformType.HOMOGRAPHY:
        p[:2] = rng.normal(0, scale, 2)
        p[2] = rng.normal(0, 5.0)
        p[5] = rng.normal(0, 5.0)
        p[6:8] = rng.normal(0, 1e-4, 2)
    return p


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_matrix_roundtrip(ttype):
    rng = np.random.default_rng(1)
    p = pad_params(jnp.asarray(np.stack([rand_params(ttype, rng) for _ in range(4)])))
    m = params_to_matrix(p, ttype)
    back = matrix_to_params(m, ttype)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-6)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_compose_matches_matrix_algebra(ttype):
    rng = np.random.default_rng(2)
    p = np.stack([rand_params(ttype, rng) for _ in range(8)])
    dp = np.stack([rand_params(ttype, rng, scale=0.05) for _ in range(8)])
    out = np.asarray(compose_inverse(jnp.asarray(p, jnp.float64),
                                     jnp.asarray(dp, jnp.float64), ttype))
    for i in range(8):
        mp = np.asarray(params_to_matrix(pad_params(jnp.asarray(p[i], jnp.float64)), ttype))
        mdp = np.asarray(params_to_matrix(pad_params(jnp.asarray(dp[i], jnp.float64)), ttype))
        ref = mp @ np.linalg.inv(mdp)
        ref = ref / ref[2, 2]
        got = np.asarray(params_to_matrix(jnp.asarray(out[i]), ttype))
        np.testing.assert_allclose(got, ref, atol=1e-9)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_compose_self_is_identity(ttype):
    rng = np.random.default_rng(3)
    p = jnp.asarray(np.stack([rand_params(ttype, rng) for _ in range(4)]), jnp.float64)
    out = compose_inverse(p, p, ttype)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-9)


def test_translation_compose_is_subtraction():
    p = jnp.asarray([[1.0, 2.0]])
    dp = jnp.asarray([[0.25, -0.5]])
    out = compose_inverse(p, dp, TransformType.TRANSLATION)
    np.testing.assert_allclose(np.asarray(out[0, :2]), [0.75, 2.5])


def test_degenerate_update_keeps_params():
    # A dp that collapses the 2x2 block -> determinant 0 -> p unchanged
    # (reference guard: src/transformation.py:79).
    p = pad_params(jnp.asarray([[1.0, 2.0, 0.1, 0.2]]))
    dp = pad_params(jnp.asarray([[0.0, 0.0, -1.0, 0.0]]))  # 1+a = 0, b = 0
    out = compose_inverse(p, dp, TransformType.SIMILARITY)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p))


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_invert_params(ttype):
    rng = np.random.default_rng(4)
    p = jnp.asarray(np.stack([rand_params(ttype, rng) for _ in range(4)]), jnp.float64)
    pinv = invert_params(p, ttype)
    # composing the transform with (inverse)^-1 == composing with itself
    ident = compose_inverse(pinv, pinv, ttype)
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-9)
    m = np.asarray(params_to_matrix(p, ttype))
    minv = np.asarray(params_to_matrix(pinv, ttype))
    prod = np.einsum("bij,bjk->bik", m, minv)
    prod = prod / prod[:, 2:3, 2:3]
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-9)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_transform_grid_matches_pointwise_projection(ttype):
    """Grid vs the reference `project` formulas (src/transformation.py:157-182),
    re-evaluated pointwise in numpy from the parameter layout definition."""
    rng = np.random.default_rng(5)
    p = rand_params(ttype, rng)
    gx, gy = transform_grid(pad_params(jnp.asarray(p, jnp.float64))[None], ttype, 7, 9)
    gx, gy = np.asarray(gx[0]), np.asarray(gy[0])
    m = np.asarray(params_to_matrix(pad_params(jnp.asarray(p, jnp.float64)), ttype))
    for y in range(7):
        for x in range(9):
            v = m @ np.array([x, y, 1.0])
            np.testing.assert_allclose([gx[y, x], gy[y, x]], v[:2] / v[2], rtol=1e-12)


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_jacobian_is_derivative_of_grid(ttype):
    """jx/jy must equal d x'(x;p) / dp at p=0 — checked by forward AD of
    transform_grid, which pins the column layout to the warp definition
    (the reference checks hand-enumerated entries instead:
    test/test_derivatives.py:13-68)."""
    import jax

    h, w = 5, 6
    jx, jy = jacobian_fields(ttype, h, w, dtype=jnp.float64)

    def grid(p):
        gx, gy = transform_grid(p[None], ttype, h, w)
        return jnp.stack([gx[0], gy[0]])

    jac = jax.jacfwd(grid)(jnp.zeros(8, jnp.float64))  # [2, H, W, 8]
    np.testing.assert_allclose(np.asarray(jx), np.asarray(jac[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jy), np.asarray(jac[1]), atol=1e-12)
    # padded columns are exactly zero
    k = nparams(ttype)
    assert np.all(np.asarray(jx)[..., k:] == 0)
    assert np.all(np.asarray(jy)[..., k:] == 0)


def test_jacobian_preconditioner_normalizes_columns():
    h, w = 64, 48
    s = param_preconditioner(TransformType.HOMOGRAPHY, h, w)
    jx, jy = jacobian_fields(TransformType.HOMOGRAPHY, h, w, dtype=jnp.float64, scale=s)
    mags = np.abs(np.asarray(jx)).max(axis=(0, 1)) + np.abs(np.asarray(jy)).max(axis=(0, 1))
    assert mags.max() <= 2.0 + 1e-9


def test_jacobian_y_offset():
    full_jx, full_jy = jacobian_fields(TransformType.HOMOGRAPHY, 8, 6, dtype=jnp.float64)
    tile_jx, tile_jy = jacobian_fields(TransformType.HOMOGRAPHY, 4, 6, dtype=jnp.float64,
                                       y_offset=4)
    np.testing.assert_allclose(np.asarray(tile_jx), np.asarray(full_jx)[4:])
    np.testing.assert_allclose(np.asarray(tile_jy), np.asarray(full_jy)[4:])


@pytest.mark.parametrize("ttype", ALL_TYPES)
def test_zoom_in_params(ttype):
    """Scaling semantics of reference zoom_in_parameters (src/zoom.py:93-123):
    translations x nu; homography p2,p5 x nu and p6,p7 / nu; the rest fixed."""
    rng = np.random.default_rng(6)
    p = rand_params(ttype, rng)
    out = np.asarray(zoom_in_params(jnp.asarray(p, jnp.float64), ttype,
                                    nx=100, ny=50, nxx=200, nyy=100))
    nu = 2.0
    exp = np.zeros(8)
    exp[: len(p)] = p
    if ttype is TransformType.HOMOGRAPHY:
        exp[2] *= nu
        exp[5] *= nu
        exp[6] /= nu
        exp[7] /= nu
    else:
        exp[0] *= nu
        exp[1] *= nu
    np.testing.assert_allclose(out, exp, rtol=1e-12)
