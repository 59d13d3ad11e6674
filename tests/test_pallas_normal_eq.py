"""Fused Pallas moment kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.pallas.normal_eq import (
    fused_hessian, fused_normal_eq, fused_rhs, weighted_moments,
)
from inverse_compositional_algorithm_tpu.ops import normal_equations as ne
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType, jacobian_fields, param_preconditioner,
)


@pytest.fixture(scope="module")
def maps():
    rng = np.random.default_rng(0)
    b, h, w = 2, 21, 37
    gx = rng.normal(size=(b, h, w))
    gy = rng.normal(size=(b, h, w))
    r = rng.normal(size=(b, h, w))
    return [jnp.asarray(m, jnp.float32)
            for m in (gx * gx, gx * gy, gy * gy, gx * r, gy * r)]


def test_moments_match_numpy(maps):
    stack = jnp.stack(maps, axis=1)
    got = np.asarray(weighted_moments(stack, tile_h=8, interpret=True))
    b, k, h, w = stack.shape
    l = float(max(h, w))
    xs = np.arange(w) / l
    ys = np.arange(h) / l
    xp = np.stack([xs ** a for a in range(5)], -1)
    yp = np.stack([ys ** c for c in range(5)], -1)
    exp = np.einsum("qkhw,wa,hc->qkca", np.asarray(stack, np.float64), xp, yp)
    np.testing.assert_allclose(got[:, :, :5, :5], exp, rtol=2e-5, atol=1e-4)
    assert (got[:, :, 5:, :] == 0).all() and (got[:, :, :, 5:] == 0).all()


@pytest.mark.parametrize("ttype", list(TransformType),
                         ids=[t.name for t in TransformType])
def test_fused_matches_xla(maps, ttype):
    b, h, w = maps[0].shape
    s = param_preconditioner(ttype, h, w)
    jx, jy = jacobian_fields(ttype, h, w, dtype=jnp.float64, scale=s)
    m64 = [jnp.asarray(np.asarray(m), jnp.float64) for m in maps]
    h_ref = np.asarray(ne.hessian(*m64[:3], jx, jy))
    b_ref = np.asarray(ne.rhs(m64[3], m64[4], jx, jy))
    hh, bb = fused_normal_eq(*maps, ttype=ttype, interpret=True)
    np.testing.assert_allclose(np.asarray(hh), h_ref,
                               atol=2e-4 * np.abs(h_ref).max())
    np.testing.assert_allclose(np.asarray(bb), b_ref,
                               atol=2e-4 * np.abs(b_ref).max())


def test_split_entry_points(maps):
    ttype = TransformType.HOMOGRAPHY
    h_all, b_all = fused_normal_eq(*maps, ttype=ttype, interpret=True)
    h_only = fused_hessian(*maps[:3], ttype=ttype, interpret=True)
    b_only = fused_rhs(*maps[3:], ttype=ttype, interpret=True)
    np.testing.assert_allclose(np.asarray(h_only), np.asarray(h_all), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b_only), np.asarray(b_all), rtol=1e-6)


def test_uneven_tiling(maps):
    stack = jnp.stack(maps, axis=1)
    a = np.asarray(weighted_moments(stack, tile_h=8, interpret=True))
    c = np.asarray(weighted_moments(stack, tile_h=64, interpret=True))
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5)
