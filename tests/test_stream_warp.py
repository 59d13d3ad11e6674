"""Large-frame streaming mode of the Pallas warp / fused-iteration kernels
(round-4 VERDICT item 1).

Above the VMEM-residency budget (~0.5 MP RGB f32) round 3 silently fell
back to the 530 ms/batch XLA gather sampler. The streaming mode keeps the
planar moving image in HBM and double-buffers row-band windows into VMEM
(ops/pallas/tile_warp.py::WindowedImage); tiles whose taps escape the
window take the exact general path with direct HBM band DMAs. These tests
pin (a) numerical identity with the XLA sampler / resident mode, (b) the
mode planner choosing the fused path — not a fallback — at 720p/1080p/4K,
and (c) end-to-end solver parity when the plan streams.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.ops.pallas import warp as pwarp
from inverse_compositional_algorithm_tpu.ops.pallas.fused_iter import (
    fused_iter_moments,
    plan_fused_iter,
)
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.pyramid import gaussian_blur
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    pad_params,
    transform_grid,
)
from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample


def _images(b=2, h=40, w=200, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, (b, h, w, c)), jnp.float32), 1.5)


def _coords(h, w):
    """One smooth-motion pair + one 17-degree-rotated pair (the second
    exercises the general path, i.e. streaming's direct HBM band DMAs)."""
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    th = 0.3
    gx = jnp.stack([xx + 2.3, jnp.cos(th) * xx - jnp.sin(th) * yy + 5.0])
    gy = jnp.stack([yy - 1.7, jnp.sin(th) * xx + jnp.cos(th) * yy - 3.0])
    return gx, gy


def test_plan_warp_mode_no_silent_fallback():
    """The VERDICT done-criterion: >= 720p frames must be served by the
    fused Pallas path (streaming), not a silent XLA-gather fallback."""
    f32 = jnp.float32
    assert pwarp.plan_warp_mode(388, 584, 3, f32) == "resident"
    assert pwarp.plan_warp_mode(720, 1280, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(1080, 1920, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(2160, 3840, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(388, 584, 3, jnp.bfloat16) is None


def test_stream_warp_matches_xla_sampler():
    h, w = 40, 200
    img = _images(h=h, w=w)
    gx, gy = _coords(h, w)
    ref = bicubic_sample(img, gx, gy)
    ip = pwarp.pad_planar(img)
    out = pwarp.pallas_warp_planar(ip, gx, gy, h, w, interpret=True,
                                   stream=True).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_stream_warp_matches_resident_bitwise():
    h, w = 48, 150
    img = _images(h=h, w=w, seed=3)
    gx, gy = _coords(h, w)
    ip = pwarp.pad_planar(img)
    res = pwarp.pallas_warp_planar(ip, gx, gy, h, w, interpret=True)
    stm = pwarp.pallas_warp_planar(ip, gx, gy, h, w, interpret=True,
                                   stream=True)
    # same tile algorithm, same summation order -> bitwise equal
    np.testing.assert_array_equal(np.asarray(res), np.asarray(stm))


@pytest.mark.parametrize("robust", [None, RobustLoss.CHARBONNIER])
def test_stream_fused_iter_matches_resident(robust):
    from inverse_compositional_algorithm_tpu.ops.gradients import (
        central_gradients,
    )
    from inverse_compositional_algorithm_tpu.ops.normal_equations import (
        grad_moments,
    )

    h, w = 40, 200
    i2 = _images(h=h, w=w, seed=5)
    gx, gy = _coords(h, w)
    i1 = bicubic_sample(i2, gx, gy)
    ix, iy = central_gradients(i1)
    gxx, gxy, gyy = grad_moments(ix, iy)
    plan = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy,
                           robust=robust is not None)
    lam = jnp.full((2,), 5.0, jnp.float32)
    kw = dict(height=h, width=w, robust=robust, nanifoutside=True, delta=4,
              interpret=True)
    m_res = fused_iter_moments(plan.i2p, plan.tplp, gx, gy, lam, **kw)
    m_stm = fused_iter_moments(plan.i2p, plan.tplp, gx, gy, lam,
                               stream=True, **kw)
    np.testing.assert_array_equal(np.asarray(m_res), np.asarray(m_stm))


def test_solver_streams_on_forced_plan(monkeypatch):
    """End-to-end: shrink the residency budget so ic_solve's plan streams,
    and check the solver still converges to the same parameters as the
    XLA path (the VERDICT 'no silent fallback' bar, solver-level)."""
    from inverse_compositional_algorithm_tpu.models.ic import ic_solve

    monkeypatch.setattr(pwarp, "_RESIDENT_BUDGET", 0)
    h, w = 40, 200
    img = _images(b=1, h=h, w=w, seed=7)
    p_gt = pad_params(jnp.asarray([[1.5, -1.0]], jnp.float32),
                      TransformType.TRANSLATION)
    gx, gy = transform_grid(p_gt, TransformType.TRANSLATION, h, w)
    i1 = bicubic_sample(img, gx, gy)
    p0 = jnp.zeros((1, 8), jnp.float32)

    s_xla = ic_solve(i1, img, p0, TransformType.TRANSLATION, delta=3,
                     robust=RobustLoss.CHARBONNIER, use_pallas=False)
    s_stm = ic_solve(i1, img, p0, TransformType.TRANSLATION, delta=3,
                     robust=RobustLoss.CHARBONNIER, use_pallas=True,
                     interpret=True)
    assert pwarp.plan_warp_mode(h, w, 3, jnp.float32) == "stream"
    np.testing.assert_allclose(np.asarray(s_stm.p[0, :2]), [1.5, -1.0],
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(s_stm.p), np.asarray(s_xla.p),
                               atol=1e-4)


def test_plan_warp_mode_boundaries():
    """Pin the planner's exact support bounds (README claims must match):
    f32 + H >= 16 + streaming window <= 8 MB run a Pallas mode; frames
    below 16 rows, non-f32 dtypes, and ultra-wide frames whose window
    exceeds the budget return None (explicit XLA fallback)."""
    f32 = jnp.float32
    # in-support: resident for small, stream for large
    assert pwarp.plan_warp_mode(388, 584, 3, f32) == "resident"
    assert pwarp.plan_warp_mode(720, 1280, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(2160, 3840, 3, f32) == "stream"
    # height bound: 16 rows is the minimum (fast-path band needs them)
    assert pwarp.plan_warp_mode(16, 584, 3, f32) is not None
    assert pwarp.plan_warp_mode(15, 584, 3, f32) is None
    # dtype bound: the Mosaic kernels are f32-only
    assert pwarp.plan_warp_mode(388, 584, 3, jnp.float64) is None
    assert pwarp.plan_warp_mode(388, 584, 3, jnp.bfloat16) is None
    # width bound: the 32-row double-buffered RGB window hits the 8 MB
    # budget at ~10.9k px (8K = 7680 px is comfortably inside)
    assert pwarp.plan_warp_mode(4320, 7680, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(64, 10000, 3, f32) == "stream"
    assert pwarp.plan_warp_mode(64, 11008, 3, f32) is None
