"""Pyramid construction unit tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.constants import ZOOM_SIGMA_ZERO
from inverse_compositional_algorithm_tpu.ops.pyramid import (
    _gaussian_kernel,
    build_pyramid,
    gaussian_blur,
    pyramid_shapes,
    zoom_out,
    zoom_size,
)


def test_zoom_size_half_up():
    # IPOL C-style rounding: int(n * factor + 0.5)
    assert zoom_size(584, 388, 0.5) == (292, 194)
    assert zoom_size(73, 73, 0.5) == (37, 37)  # round-half-up at x.5


def test_pyramid_shapes_chain():
    shapes = pyramid_shapes(388, 584, 5, 0.5)
    assert shapes[0] == (388, 584)
    assert shapes[1] == (194, 292)
    assert shapes[2] == (97, 146)
    assert shapes[3] == (49, 73)
    assert shapes[4] == (25, 37)


def test_gaussian_kernel_normalized():
    k = _gaussian_kernel(1.039)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k.shape[0] == 2 * int(4 * 1.039 + 0.5) + 1


def test_blur_preserves_constant():
    img = jnp.full((1, 20, 24, 3), 7.0, jnp.float64)
    out = gaussian_blur(img, 1.5)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-10)


def test_blur_matches_separable_numpy():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 16, 18, 1))
    sigma = 1.2
    k = _gaussian_kernel(sigma).astype(np.float64)
    r = (len(k) - 1) // 2
    pad = np.pad(img[0, :, :, 0], r, mode="symmetric")
    tmp = np.apply_along_axis(lambda m: np.convolve(m, k, "valid"), 0, pad)
    exp = np.apply_along_axis(lambda m: np.convolve(m, k, "valid"), 1, tmp)
    got = np.asarray(gaussian_blur(jnp.asarray(img), sigma))[0, :, :, 0]
    np.testing.assert_allclose(got, exp, atol=1e-6)


@pytest.mark.parametrize("method", ["ipol", "antialias"])
def test_zoom_out_shape_and_range(method):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (2, 40, 60, 3)), jnp.float32)
    out = zoom_out(img, 0.5, method)
    assert out.shape == (2, 20, 30, 3)
    # downsampling a 0..255 image stays in (slightly overshot) range
    assert float(jnp.min(out)) > -30 and float(jnp.max(out)) < 290


def test_zoom_out_constant_exact():
    img = jnp.full((1, 32, 32, 1), 100.0, jnp.float64)
    out = zoom_out(img, 0.5, "ipol")
    np.testing.assert_allclose(np.asarray(out), 100.0, rtol=1e-9)


def test_build_pyramid_levels():
    img = jnp.zeros((1, 64, 80, 3), jnp.float32)
    levels = build_pyramid(img, 3, 0.5)
    assert [l.shape for l in levels] == [
        (1, 64, 80, 3), (1, 32, 40, 3), (1, 16, 20, 3)]


def test_ipol_sigma_value():
    # sigma = 0.6 * sqrt(1/nu^2 - 1) = 0.6*sqrt(3) for nu = 0.5
    from inverse_compositional_algorithm_tpu.ops.pyramid import _aa_sigma
    assert abs(_aa_sigma(0.5, "ipol") - 0.6 * np.sqrt(3.0)) < 1e-12
    assert abs(_aa_sigma(0.5, "antialias") - 0.5) < 1e-12


def test_zoom_out_matches_gather_sampler():
    """The matmul resample must agree with the 16-tap gather sampler."""
    import jax.numpy as jnp

    from inverse_compositional_algorithm_tpu.ops.pyramid import (
        _aa_sigma, gaussian_blur, zoom_out, zoom_size,
    )
    from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (2, 37, 53, 3)), jnp.float32)
    for method in ("ipol", "antialias"):
        nu = 0.5
        got = zoom_out(img, nu, method)
        nxx, nyy = zoom_size(53, 37, nu)
        sm = gaussian_blur(img, _aa_sigma(nu, method))
        ox = jnp.arange(nxx, dtype=jnp.float32)
        oy = jnp.arange(nyy, dtype=jnp.float32)
        if method == "ipol":
            sx, sy = ox / nu, oy / nu
        else:
            sx, sy = (ox + 0.5) / nu - 0.5, (oy + 0.5) / nu - 0.5
        gx = jnp.broadcast_to(sx[None, None, :], (2, nyy, nxx))
        gy = jnp.broadcast_to(sy[None, :, None], (2, nyy, nxx))
        ref = bicubic_sample(sm, gx, gy)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)
