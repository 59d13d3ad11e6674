"""shard_map tiled solver: parity with the single-device solver.

Runs on the 8-fake-device CPU mesh (conftest). The tiled path must agree
with models.ic.ic_solve up to float summation order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.models.ic import ic_solve
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.transforms import TransformType
from inverse_compositional_algorithm_tpu.parallel.mesh import make_mesh
from inverse_compositional_algorithm_tpu.parallel.tiled import tiled_ic_solve


def _pair_batch(make_pair, p_gt, ttype, b=2, h=64, w=80):
    i1, i2 = make_pair(p_gt, ttype)
    i1 = np.broadcast_to(i1[None, :h, :w], (b, h, w, 3)).astype(np.float32)
    i2 = np.broadcast_to(i2[None, :h, :w], (b, h, w, 3)).astype(np.float32)
    return jnp.asarray(i1), jnp.asarray(i2), jnp.zeros((b, 8), jnp.float32)


@pytest.mark.parametrize("ttype,p_gt", [
    (TransformType.TRANSLATION, [1.5, -1.0]),
    (TransformType.HOMOGRAPHY, [0.01, 0.002, 1.0, -0.001, 0.005, 0.5,
                                2e-5, -3e-5]),
], ids=["translation", "homography"])
def test_tiled_matches_single_device(make_pair, ttype, p_gt):
    i1, i2, p0 = _pair_batch(make_pair, p_gt, ttype)
    mesh = make_mesh(pairs=2, tile=4)
    st_t = tiled_ic_solve(i1, i2, p0, ttype, mesh=mesh, delta=8)
    st_s = ic_solve(i1, i2, p0, ttype, delta=8)
    np.testing.assert_allclose(np.asarray(st_t.p), np.asarray(st_s.p),
                               atol=2e-4)
    est = np.asarray(st_t.p)[0, :len(p_gt)]
    np.testing.assert_allclose(est, p_gt, atol=2e-3)


def test_tiled_robust_matches(make_pair):
    p_gt = [1.5, -1.0, 0.01]
    i1, i2, p0 = _pair_batch(make_pair, p_gt, TransformType.EUCLIDEAN)
    mesh = make_mesh(pairs=1, tile=8)
    st_t = tiled_ic_solve(i1, i2, p0, TransformType.EUCLIDEAN, mesh=mesh,
                          delta=8, robust=RobustLoss.CHARBONNIER)
    st_s = ic_solve(i1, i2, p0, TransformType.EUCLIDEAN, delta=8,
                    robust=RobustLoss.CHARBONNIER)
    np.testing.assert_allclose(np.asarray(st_t.p), np.asarray(st_s.p),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_t.p)[0, :3], p_gt, atol=5e-3)


def test_tiled_validates_divisibility(make_pair):
    i1, i2, p0 = _pair_batch(make_pair, [1.0, 0.0],
                             TransformType.TRANSLATION, h=60)
    mesh = make_mesh(pairs=1, tile=8)
    with pytest.raises(ValueError, match="not divisible"):
        tiled_ic_solve(i1, i2, p0, TransformType.TRANSLATION, mesh=mesh)


def test_tiled_pallas_warp_matches(make_pair):
    """use_pallas=True swaps the XLA gather for the Pallas tile warp under
    shard_map (interpreter on the CPU lane); results must match the
    XLA-warp tiled solve to summation-order tolerance."""
    from inverse_compositional_algorithm_tpu.parallel.tiled import (
        _build_tiled_fn,  # noqa: F401  (cache exercised via public API)
    )

    p_gt = [1.5, -1.0]
    i1, i2, p0 = _pair_batch(make_pair, p_gt, TransformType.TRANSLATION)
    mesh = make_mesh(pairs=2, tile=4)
    st_x = tiled_ic_solve(i1, i2, p0, TransformType.TRANSLATION, mesh=mesh,
                          delta=8)
    st_p = tiled_ic_solve(i1, i2, p0, TransformType.TRANSLATION, mesh=mesh,
                          delta=8, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(st_p.p), np.asarray(st_x.p),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_p.p)[0, :2], p_gt, atol=2e-3)


def test_tiled_pyramidal_matches_pyramidal_solve(make_pair):
    """The SP pyramid driver must agree with models.pyramidal.pyramidal_solve
    (both warm-start propagation and per-level solves), mixing tiled levels
    (height divisible by the tile axis) with single-device coarse levels."""
    from inverse_compositional_algorithm_tpu.models.pyramidal import (
        pyramidal_solve,
    )
    from inverse_compositional_algorithm_tpu.parallel.tiled import (
        tiled_pyramidal_solve,
    )

    p_gt = [3.0, -2.0]
    i1, i2, p0 = _pair_batch(make_pair, p_gt, TransformType.TRANSLATION,
                             b=2, h=64, w=80)
    mesh = make_mesh(pairs=2, tile=4)
    st_t, per_t = tiled_pyramidal_solve(
        i1, i2, p0, TransformType.TRANSLATION, mesh=mesh, nscales=3,
        delta=6, robust=RobustLoss.CHARBONNIER)
    st_s, per_s = pyramidal_solve(
        i1, i2, p0, TransformType.TRANSLATION, nscales=3, delta=6,
        robust=RobustLoss.CHARBONNIER)
    assert len(per_t) == len(per_s) == 3
    np.testing.assert_allclose(np.asarray(st_t.p), np.asarray(st_s.p),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_t.p)[0, :2], p_gt, atol=5e-3)
