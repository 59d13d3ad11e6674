"""End-to-end solver tests on small synthetic pairs (fast compiles).

Pairs are built so the solver's fixed point is exactly the ground-truth
parameters (see conftest.synth_pair). Accuracy bar: the reference TF stack
achieves ~1e-4 on translation at 584x388 (SURVEY §6); we require 1e-3 on
64x80 crops in float32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import inverse_compositional_algorithm_tpu as ica
from inverse_compositional_algorithm_tpu.ops.transforms import TransformType
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss

CASES = [
    (TransformType.TRANSLATION, [1.5, -1.0]),
    (TransformType.EUCLIDEAN, [1.5, -1.0, 0.01]),
    (TransformType.SIMILARITY, [1.0, -0.5, 0.01, 0.005]),
    (TransformType.AFFINITY, [1.0, 0.5, 0.01, -0.005, 0.004, 0.008]),
    (TransformType.HOMOGRAPHY, [0.01, 0.002, 1.0, -0.001, 0.005, 0.5, 2e-5, -3e-5]),
]


def crop(make_pair, p, ttype):
    i1, i2 = make_pair(p, ttype)
    return i1[:64, :80], i2[:64, :80]


@pytest.mark.parametrize("ttype,p_gt", CASES, ids=[c[0].name for c in CASES])
def test_single_scale_quadratic(make_pair, ttype, p_gt):
    i1, i2 = crop(make_pair, p_gt, ttype)
    cfg = ica.AlignConfig(transform=ttype, nscales=1, delta=8)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, p_gt, atol=2e-3)
    assert res.error <= 1e-3 or res.niters == cfg.max_iter


@pytest.mark.parametrize("robust", [RobustLoss.CHARBONNIER, RobustLoss.LORENTZIAN,
                                    RobustLoss.GERMAN_MCCLURE,
                                    RobustLoss.TRUNCATED_QUADRATIC])
def test_single_scale_robust(make_pair, robust):
    p_gt = [1.5, -1.0, 0.01]
    i1, i2 = crop(make_pair, p_gt, TransformType.EUCLIDEAN)
    lam = 5.0 if robust is RobustLoss.TRUNCATED_QUADRATIC else 0.0
    cfg = ica.AlignConfig(transform=TransformType.EUCLIDEAN, nscales=1,
                          delta=8, robust=robust, lam=lam)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, p_gt, atol=5e-3)


def test_pyramid_large_motion(make_pair):
    """A 6-px translation that the single-scale solver cannot catch from
    p0 = 0 converges through the pyramid (the reference's raison d'être for
    C20)."""
    p_gt = [6.0, -4.0]
    i1, i2 = make_pair(p_gt, TransformType.TRANSLATION)
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=3, delta=8)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, p_gt, atol=5e-3)


def test_batched_independent_convergence(make_pair):
    """Per-pair convergence masking: two pairs with different motions both
    converge to their own gt (the reference TF batch cannot do this —
    shared criterion, src/keras-tf/tf_inverse_compositional_algorithm.py:225-232)."""
    pa = [1.0, -0.5]
    pb = [-2.0, 1.5]
    i1a, i2a = crop(make_pair, pa, TransformType.TRANSLATION)
    i1b, i2b = crop(make_pair, pb, TransformType.TRANSLATION)
    i1 = np.stack([i1a, i1b])
    i2 = np.stack([i2a, i2b])
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=1, delta=8)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.p)
    np.testing.assert_allclose(est[0, :2], pa, atol=2e-3)
    np.testing.assert_allclose(est[1, :2], pb, atol=2e-3)
    # iteration counts may differ per pair
    assert res.niters.shape == (2,)


def test_warm_start_skips_iterations(make_pair):
    p_gt = [1.5, -1.0]
    i1, i2 = crop(make_pair, p_gt, TransformType.TRANSLATION)
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=1, delta=8)
    cold = ica.align(i1, i2, cfg)
    warm = ica.align(i1, i2, cfg, p0=np.array([1.5, -1.0]))
    assert int(warm.niters) <= int(cold.niters)
    np.testing.assert_allclose(np.asarray(warm.params(cfg)), p_gt, atol=2e-3)


def test_nanifoutside_fill_modes(make_pair):
    p_gt = [1.5, -1.0]
    i1, i2 = crop(make_pair, p_gt, TransformType.TRANSLATION)
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=1, delta=8)
    res = ica.align(i1, i2, cfg)
    assert np.isnan(np.asarray(res.iw)).any()  # NaN band like the reference
    cfg0 = cfg.replace(nanifoutside=False)
    res0 = ica.align(i1, i2, cfg0)
    assert not np.isnan(np.asarray(res0.iw)).any()


def test_identical_pair_converges_immediately(make_pair):
    i1, i2 = crop(make_pair, [0.0, 0.0], TransformType.TRANSLATION)
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=1, delta=8)
    res = ica.align(i2, i2, cfg)
    assert int(res.niters) <= 2
    np.testing.assert_allclose(np.asarray(res.params(cfg)), 0.0, atol=1e-4)


def test_layers_mirror_reference_api(make_pair):
    from inverse_compositional_algorithm_tpu.models.layers import (
        PyramidalInverseCompositional,
    )

    p_gt = [1.5, -1.0]
    i1, i2 = crop(make_pair, p_gt, TransformType.TRANSLATION)
    layer = PyramidalInverseCompositional(
        transform_type=TransformType.TRANSLATION, nscales=2, verbose=False, delta=8)
    p, error, di, iw = layer((i1, i2))
    np.testing.assert_allclose(np.asarray(p), p_gt, atol=5e-3)
    assert di.shape == i1.shape and iw.shape == i2.shape
