"""Golden-trace validation against the IPOL C++ oracle.

The reference stores verbatim console traces of the original IPOL C++
binary on the Middlebury rubber_whale pairs (reference:
docs/Algortihm Report.md:38-433); the numpy implementation was validated
against them and so is this build. Expected values below are the C++
final parameters; tolerances account for the interpolant difference
(Keys vs the C++'s bicubic) and float32 vs the C++'s double.
"""

import os

import numpy as np
import pytest

import inverse_compositional_algorithm_tpu as ica
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.transforms import TransformType
from inverse_compositional_algorithm_tpu.utils.imageio import load_image

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available")


def pair(name):
    i1 = load_image(os.path.join(DATA, f"rubber_whale_{name}.png"))
    i2 = load_image(os.path.join(DATA, "rubber_whale.png"))
    return i1, i2


def test_translation_3scale_quadratic():
    """C++ oracle: 3-scale translation -> (-10.000018, -4.999990)
    (docs/Algortihm Report.md:133-155)."""
    i1, i2 = pair("tr")
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=3)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [-10.000018, -4.999990], atol=1e-4)


def test_translation_1scale_quadratic():
    """C++ oracle: 1-scale translation converges in 13 iterations to
    (-9.999883, -4.999988) (docs/Algortihm Report.md:38-66)."""
    i1, i2 = pair("tr")
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=1)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [-9.999883, -4.999988], atol=1e-4)
    # C++ needed exactly 13 iterations; so does this build (measured — the
    # full per-iteration comparison lives in test_golden_traces.py).
    assert int(res.niters) == 13


def test_rotation_3scale_quadratic():
    """C++ oracle: rt pair, euclidean, 3 scales ->
    (0.000138, 0.000128, -0.100000) (docs/Algortihm Report.md:158-225)."""
    i1, i2 = pair("rt")
    cfg = ica.AlignConfig(transform=TransformType.EUCLIDEAN, nscales=3)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [0.000138, 0.000128, -0.1], atol=1e-4)


def test_euclidean_3scale_quadratic():
    """C++ oracle: eu pair, euclidean, 3 scales ->
    (-10.449191, -3.976721, -0.100000) (docs/Algortihm Report.md:226-293)."""
    i1, i2 = pair("eu")
    cfg = ica.AlignConfig(transform=TransformType.EUCLIDEAN, nscales=3)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [-10.449191, -3.976721, -0.1], atol=1e-4)


def test_translation_robust_charbonnier():
    """C++ oracle (robust Charbonnier, 3-scale): (-10.000000, -5.000000)
    (docs/Algortihm Report.md:349-365); also reference TF result
    (-10.0000515, -5.000031) (test/ica_keras_unit_tests.ipynb cell 11)."""
    i1, i2 = pair("tr")
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=3,
                          robust=RobustLoss.CHARBONNIER)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [-10.0, -5.0], atol=5e-4)


def test_similarity_3scale_quadratic():
    """C++ oracle: zo pair, similarity, 3 scales ->
    (-0.000282, 0.000022, 0.111108, -0.000001) — the similarity zoom
    a = 1/0.9 - 1 (docs/Algortihm Report.md:258-339)."""
    i1, i2 = pair("zo")
    cfg = ica.AlignConfig(transform=TransformType.SIMILARITY, nscales=3)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(
        est, [-0.000282, 0.000022, 0.111108, -0.000001], atol=5e-4)


def test_similarity_robust_charbonnier():
    """C++ oracle (robust Charbonnier, 3-scale, zo pair):
    (-0.000247, 0.000160, 0.111107, -0.000002)
    (docs/Algortihm Report.md:411-433)."""
    i1, i2 = pair("zo")
    cfg = ica.AlignConfig(transform=TransformType.SIMILARITY, nscales=3,
                          robust=RobustLoss.CHARBONNIER)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    # IRLS trajectories deviate slightly from the C++ (same documented
    # behavior as the reference numpy port, docs/Algortihm Report.md:438);
    # the scale parameter is pinned tightly, translation to ~1/200 px.
    np.testing.assert_allclose(est[2], 0.111107, atol=5e-4)
    np.testing.assert_allclose(
        est[[0, 1, 3]], [-0.000247, 0.000160, -0.000002], atol=5e-3)


def test_euclidean_robust_charbonnier():
    """C++ oracle (robust Charbonnier, 3-scale, eu pair):
    (-10.449181, -3.976687, -0.100000) (docs/Algortihm Report.md:389-406)."""
    i1, i2 = pair("eu")
    cfg = ica.AlignConfig(transform=TransformType.EUCLIDEAN, nscales=3,
                          robust=RobustLoss.CHARBONNIER)
    res = ica.align(i1, i2, cfg)
    est = np.asarray(res.params(cfg))
    np.testing.assert_allclose(est, [-10.449181, -3.976687, -0.1], atol=1e-3)


def test_transform_image_roundtrip():
    """transform_image(I, gt) then align recovers params(M(gt)^-1), the
    reference's gt-generation convention (src/transformation.py:266-318 +
    test/ica_keras_unit_tests.ipynb cell 9)."""
    from inverse_compositional_algorithm_tpu.ops.transforms import (
        invert_params, pad_params,
    )

    i2 = load_image(os.path.join(DATA, "rubber_whale.png"))
    gt = np.array([7.0, -4.0], np.float32)
    i1 = ica.transform_image(i2, TransformType.TRANSLATION, gt)
    cfg = ica.AlignConfig(transform=TransformType.TRANSLATION, nscales=3)
    res = ica.align(i1, i2, cfg)
    expect = np.asarray(invert_params(
        pad_params(gt, TransformType.TRANSLATION), TransformType.TRANSLATION))
    np.testing.assert_allclose(np.asarray(res.params(cfg)), expect[:2],
                               atol=5e-3)
