"""Pallas fused warp kernel vs the XLA gather sampler (its oracle).

Runs in interpreter mode on the CPU test mesh; the TPU lowering is
exercised by bench/driver runs. Tolerances are float32 summation-order
level: both paths evaluate identical Keys taps with identical clipping.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.pallas.warp import (
    pad_planar,
    pallas_warp_planar,
    plan_fast_warp,
    warp_image_fast,
)
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    pad_params,
    transform_grid,
)
from inverse_compositional_algorithm_tpu.ops.warp import (
    bicubic_sample,
    warp_image,
)


def _image(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 255, (b, h, w, c)), jnp.float32)


CASES = [
    (TransformType.TRANSLATION, [3.25, -2.5]),
    (TransformType.TRANSLATION, [-11.0, 7.75]),
    (TransformType.EUCLIDEAN, [1.5, -0.5, 0.05]),
    (TransformType.SIMILARITY, [0.5, 1.0, 0.04, -0.03]),
    (TransformType.AFFINITY, [1.0, -1.0, 0.05, -0.02, 0.03, -0.04]),
    (TransformType.HOMOGRAPHY,
     [0.02, -0.01, 2.0, 0.015, -0.02, -1.5, 1e-4, -5e-5]),
]


@pytest.mark.parametrize("ttype,p", CASES)
def test_kernel_matches_gather_sampler(ttype, p):
    img = _image(2, 37, 53, 3)
    pp = jnp.broadcast_to(pad_params(jnp.asarray(p, jnp.float32), ttype),
                          (2, 8))
    gx, gy = transform_grid(pp, ttype, 37, 53)
    hb = plan_fast_warp(37, 53, 3, jnp.float32)
    assert hb is not None
    got = pallas_warp_planar(pad_planar(img), gx, gy, 37, 53, hb=hb, interpret=True)
    ref = bicubic_sample(img, gx, gy)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("shape", [(1, 16, 128, 1), (2, 97, 146, 3),
                                   (1, 40, 300, 2), (1, 24, 127, 3)])
def test_kernel_shapes(shape):
    b, h, w, c = shape
    img = _image(b, h, w, c, seed=h)
    p = jnp.broadcast_to(
        pad_params(jnp.asarray([2.5, -1.25, 0.03], jnp.float32),
                   TransformType.EUCLIDEAN), (b, 8))
    gx, gy = transform_grid(p, TransformType.EUCLIDEAN, h, w)
    hb = plan_fast_warp(h, w, c, jnp.float32)
    assert hb is not None
    got = pallas_warp_planar(pad_planar(img), gx, gy, h, w, hb=hb, interpret=True)
    ref = bicubic_sample(img, gx, gy)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 3, 1)),
                               np.asarray(ref), atol=2e-3)


def test_checked_warp_matches_warp_image():
    img = _image(2, 37, 53, 3)
    p = jnp.broadcast_to(
        pad_params(jnp.asarray([1.5, -0.5, 0.05], jnp.float32),
                   TransformType.EUCLIDEAN), (2, 8))
    gx, gy = transform_grid(p, TransformType.EUCLIDEAN, 37, 53)
    hb = plan_fast_warp(37, 53, 3, jnp.float32)
    got, valid = warp_image_fast(img, pad_planar(img), gx, gy, delta=5,
                                 hb=hb, interpret=True)
    ref, vref = warp_image(img, p, TransformType.EUCLIDEAN, delta=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(vref))


def test_overflow_falls_back_exactly():
    """A 90-degree-ish rotation shears far beyond the band: the checked
    warp must detect it and return the gather sampler's exact result."""
    img = _image(1, 64, 200, 3)
    p = pad_params(jnp.asarray([[0.0, 0.0, 1.2]], jnp.float32),
                   TransformType.EUCLIDEAN)
    gx, gy = transform_grid(p, TransformType.EUCLIDEAN, 64, 200)
    hb = plan_fast_warp(64, 200, 3, jnp.float32)
    got, _ = warp_image_fast(img, pad_planar(img), gx, gy, delta=0,
                             hb=hb, interpret=True)
    ref = bicubic_sample(img, gx, gy)
    # The unchecked kernel is badly wrong here (band overflow) ...
    raw = pallas_warp_planar(pad_planar(img), gx, gy, 64, 200, hb=hb,
                             interpret=True).transpose(0, 2, 3, 1)
    assert np.abs(np.asarray(raw) - np.asarray(ref)).max() > 1.0
    # ... while the checked warp detects it and matches the sampler.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_plan_rejects_unsupported():
    assert plan_fast_warp(8, 128, 3, jnp.float32) is None      # too short
    assert plan_fast_warp(388, 584, 3, jnp.float64) is None    # not f32
    assert plan_fast_warp(2048, 2048, 3, jnp.float32) is None  # VMEM
    assert plan_fast_warp(388, 584, 3, jnp.float32) == 32
