"""Legacy per-pixel operators: parity with the channel-reduced fast path.

The reference's matrix_operators.py (src/matrix_operators.py:3-63) holds the
pre-einsum per-pixel formulation; summing it over pixels must reproduce the
production `hessian`/`rhs` exactly.
"""

import numpy as np
import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.gradients import central_gradients
from inverse_compositional_algorithm_tpu.ops.matrix_operators import (
    ata, atb, sata, satb, steepest_descent_images,
)
from inverse_compositional_algorithm_tpu.ops.normal_equations import (
    grad_moments, hessian, residual_moments, rhs,
)
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType, jacobian_fields,
)


def _setup(seed=0, b=2, h=12, w=16, c=3, ttype=TransformType.HOMOGRAPHY):
    # float64 (x64 is on in conftest) so slow-vs-fast parity is exact up to
    # summation order at ~1e-12 relative, not f32 rounding.
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 255, (b, h, w, c)), jnp.float64)
    di = jnp.asarray(rng.normal(0, 10, (b, h, w, c)), jnp.float64)
    ix, iy = central_gradients(img)
    jx, jy = jacobian_fields(ttype, h, w, dtype=jnp.float64)
    return ix, iy, di, jx, jy


def test_sdi_matches_reference_factorization():
    ix, iy, _, jx, jy = _setup()
    dij = steepest_descent_images(ix, iy, jx, jy)
    assert dij.shape == (*ix.shape, 8)
    # spot-check one pixel against the scalar formula
    b, y, x, c, n = 1, 5, 7, 2, 3
    expect = ix[b, y, x, c] * jx[y, x, n] + iy[b, y, x, c] * jy[y, x, n]
    np.testing.assert_allclose(dij[b, y, x, c, n], expect, rtol=1e-6)


def test_ata_sum_equals_hessian():
    ix, iy, _, jx, jy = _setup()
    dij = steepest_descent_images(ix, iy, jx, jy)
    h_slow = jnp.sum(ata(dij), axis=(1, 2))
    gxx, gxy, gyy = grad_moments(ix, iy)
    h_fast = hessian(gxx, gxy, gyy, jx, jy, chunk=64)
    np.testing.assert_allclose(np.asarray(h_slow), np.asarray(h_fast),
                               rtol=1e-9, atol=1e-6)


def test_atb_sum_equals_rhs():
    ix, iy, di, jx, jy = _setup()
    dij = steepest_descent_images(ix, iy, jx, jy)
    b_slow = jnp.sum(atb(dij, di), axis=(1, 2))
    u, v = residual_moments(ix, iy, di)
    b_fast = rhs(u, v, jx, jy)
    np.testing.assert_allclose(np.asarray(b_slow), np.asarray(b_fast),
                               rtol=1e-9, atol=1e-6)


def test_weighted_variants_match():
    ix, iy, di, jx, jy = _setup()
    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(0.1, 1.0, ix.shape[:3]), jnp.float64)
    dij = steepest_descent_images(ix, iy, jx, jy)
    h_slow = jnp.sum(sata(rho, dij), axis=(1, 2))
    b_slow = jnp.sum(satb(rho, dij, di), axis=(1, 2))
    gxx, gxy, gyy = grad_moments(ix, iy)
    u, v = residual_moments(ix, iy, di)
    h_fast = hessian(gxx, gxy, gyy, jx, jy, weights=rho, chunk=64)
    b_fast = rhs(u, v, jx, jy, weights=rho)
    np.testing.assert_allclose(np.asarray(h_slow), np.asarray(h_fast),
                               rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_slow), np.asarray(b_fast),
                               rtol=1e-9, atol=1e-6)
