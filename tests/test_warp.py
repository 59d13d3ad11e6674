"""Bicubic sampling / warping unit tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.transforms import TransformType, pad_params
from inverse_compositional_algorithm_tpu.ops.warp import (
    bicubic_sample,
    domain_mask,
    keys_cubic_weights,
    warp_image,
)


def keys_reference(x):
    """Keys a=-0.5 basis (reference: src/keras-tf/tf_bicubic_interpolation.py:21-29)."""
    ax = abs(x)
    if ax <= 1:
        return 1.5 * ax**3 - 2.5 * ax**2 + 1.0
    if ax < 2:
        return -0.5 * ax**3 + 2.5 * ax**2 - 4.0 * ax + 2.0
    return 0.0


def test_weights_match_keys_basis():
    ts = np.linspace(0, 0.999, 21)
    w = keys_cubic_weights(jnp.asarray(ts))
    for k, offset in enumerate((-1, 0, 1, 2)):
        exp = [keys_reference(t - offset) for t in ts]
        np.testing.assert_allclose(np.asarray(w[k]), exp, atol=1e-6)


def test_weights_partition_of_unity():
    ts = jnp.linspace(0.0, 0.999, 37)
    w = keys_cubic_weights(ts)
    np.testing.assert_allclose(np.asarray(sum(w)), 1.0, atol=1e-6)


def test_integer_shift_is_exact():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 20, 24, 3)), jnp.float32)
    gx = jnp.broadcast_to(jnp.arange(24, dtype=jnp.float32)[None, None, :] + 3.0,
                          (1, 20, 24))
    gy = jnp.broadcast_to(jnp.arange(20, dtype=jnp.float32)[None, :, None] + 2.0,
                          (1, 20, 24))
    out = np.asarray(bicubic_sample(img, gx, gy))
    np.testing.assert_allclose(out[0, :18, :21], np.asarray(img)[0, 2:, 3:], atol=1e-5)


def test_reproduces_quadratic_polynomial():
    """Keys a=-0.5 cubic convolution is third-order accurate: exact on
    polynomials of degree <= 2 (not 3) over interior samples."""
    xs = np.arange(16, dtype=np.float64)
    f = lambda x: -0.4 * x**2 + 2.0 * x + 1.0
    row = f(xs)
    img = jnp.asarray(np.tile(row, (8, 1))[None, :, :, None], jnp.float64)
    q = np.linspace(2.0, 12.7, 9)
    gx = jnp.asarray(np.tile(q, (1, 4, 1)), jnp.float64).reshape(1, 4, 9)
    gy = jnp.full((1, 4, 9), 3.0, jnp.float64)
    out = np.asarray(bicubic_sample(img, gx, gy))[0, 0, :, 0]
    np.testing.assert_allclose(out, f(q), rtol=1e-12)


def test_domain_mask_semantics():
    """out = x<delta or x>nx-1-delta or y<delta or y>ny-1-delta
    (reference: src/bicubic_interpolation.py:144)."""
    gx = jnp.asarray([[ [4.9, 5.0, 10.0, 14.0, 14.1] ]])
    gy = jnp.full_like(gx, 7.0)
    m = np.asarray(domain_mask(gx, gy, height=20, width=20, delta=5))
    np.testing.assert_array_equal(m[0, 0], [False, True, True, True, False])


def test_warp_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 12, 14, 3)), jnp.float32)
    p = jnp.zeros((2, 8), jnp.float32)
    out, valid = warp_image(img, p, TransformType.HOMOGRAPHY, delta=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert np.asarray(valid).all()


def test_warp_translation_mask():
    img = jnp.ones((1, 16, 16, 1), jnp.float32)
    p = pad_params(jnp.asarray([[3.0, 0.0]]))
    _, valid = warp_image(img, p, TransformType.TRANSLATION, delta=2)
    v = np.asarray(valid)[0]
    # source x = x+3 must lie in [2, 13] -> x in [-1, 10] -> clipped [0, 10]
    assert v[8, 10] and not v[8, 11]
    # y untouched: rows 2..13 valid
    assert v[2, 5] and not v[1, 5]
