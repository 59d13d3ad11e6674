"""Iteration-level golden-trace validation against the IPOL C++ binary.

The reference's prescribed methodology (docs/Algortihm Report.md:23-34) is
to compare per-iteration |Dp| / p trajectories — not just final values —
against the stored C++ console traces. `pyramidal_solve(collect_trace=True)`
reproduces exactly those trajectories; here they are asserted per
iteration, per scale.

Calibration: on the quadratic cases this build tracks the C++ traces to
~1e-5 per iteration (measured 2026-08; the float32 pipeline, Keys
interpolant and IPOL pyramid reproduce the C++ trajectory essentially
exactly, including the iteration counts). The robust IRLS trajectories
deviate mid-course (the rho' weights amplify tiny interpolant differences;
the reference numpy port records the same behavior,
docs/Algortihm Report.md:438-439), so for robust cases the first
iteration, the lambda schedule and the final parameters are pinned
instead of the full trajectory.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.models.pyramidal import pyramidal_solve
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.transforms import TransformType
from inverse_compositional_algorithm_tpu.utils.imageio import load_image

import golden_traces as gt

DATA = "/root/reference/test/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available")


def run_traced(name, ttype, nscales, robust=RobustLoss.QUADRATIC):
    i1 = load_image(os.path.join(DATA, f"rubber_whale_{name}.png"))
    i2 = load_image(os.path.join(DATA, "rubber_whale.png"))
    i1 = jnp.asarray(i1, jnp.float32)[None]
    i2 = jnp.asarray(i2, jnp.float32)[None]
    p0 = jnp.zeros((1, 8), jnp.float32)
    state, per_scale, traces = pyramidal_solve(
        i1, i2, p0, ttype, nscales=nscales, robust=robust,
        collect_trace=True)
    out = []
    for s, (err, p, lam) in enumerate(traces):
        ni = int(per_scale[s].niters[0])
        out.append((ni, np.asarray(err[:, 0]), np.asarray(p[:, 0]),
                    np.asarray(lam[:, 0])))
    return state, out


def check_scale_trace(ours, cpp, *, np_, atol):
    """Assert one scale's (|Dp|, p) trajectory matches the C++ trace."""
    ni, err, p, _ = ours
    assert ni == len(cpp), f"iteration count {ni} != C++ {len(cpp)}"
    for i, row in enumerate(cpp):
        np.testing.assert_allclose(
            err[i], row[0], atol=atol, rtol=1e-3,
            err_msg=f"|Dp| mismatch at iteration {i}")
        np.testing.assert_allclose(
            p[i, :np_], row[1 : 1 + np_], atol=atol,
            err_msg=f"p mismatch at iteration {i}")


def test_translation_1scale_trace():
    """Every iteration of the 1-scale quadratic translation run matches the
    C++ trace (docs/Algortihm Report.md:38-66), including the count (13)."""
    _, scales = run_traced("tr", TransformType.TRANSLATION, 1)
    check_scale_trace(scales[0], gt.TR_1S_QUAD[0], np_=2, atol=2e-3)


def test_translation_3scale_trace():
    """Full 3-scale quadratic trajectory incl. the between-scale parameter
    upscaling (docs/Algortihm Report.md:133-155)."""
    _, scales = run_traced("tr", TransformType.TRANSLATION, 3)
    for ours, cpp in zip(scales, gt.TR_3S_QUAD):
        check_scale_trace(ours, cpp, np_=2, atol=2e-3)


def test_rotation_3scale_trace():
    """Euclidean rt pair: the long 19-iteration coarsest-scale trajectory
    through the rotation well (docs/Algortihm Report.md:156-205)."""
    _, scales = run_traced("rt", TransformType.EUCLIDEAN, 3)
    for ours, cpp in zip(scales, gt.RT_3S_QUAD):
        check_scale_trace(ours, cpp, np_=3, atol=4e-3)


def test_similarity_3scale_trace_endpoints():
    """zo pair (similarity): iteration counts per scale (30/6/3 — the
    coarsest scale hits MAX_ITER), first iteration, and final parameters
    (docs/Algortihm Report.md:257-339)."""
    state, scales = run_traced("zo", TransformType.SIMILARITY, 3)
    assert [s[0] for s in scales] == gt.ZO_3S_QUAD_NITERS
    ni, err, p, _ = scales[0]
    np.testing.assert_allclose(err[0], gt.ZO_3S_QUAD_FIRST[0], atol=2e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(p[0, :4], gt.ZO_3S_QUAD_FIRST[1:], atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.p[0, :4]),
                               gt.ZO_3S_QUAD_FINAL[1:], atol=5e-4)


def test_robust_lambda_schedule_and_first_iterations():
    """Charbonnier tr pair: the lambda continuation schedule must equal the
    C++ one exactly (80 -> x0.9 each iteration, printed post-anneal:
    72, 64.8, 58.32, ... — docs/Algortihm Report.md:348-364), the first
    iteration of every scale must match (identical starting state), and
    the final parameters must hit the C++ optimum."""
    state, scales = run_traced("tr", TransformType.TRANSLATION, 3,
                               robust=RobustLoss.CHARBONNIER)
    for (ni, err, p, lam), cpp in zip(scales, gt.TR_3S_CHAR):
        # IRLS trajectories legitimately differ mid-course; counts within 1.
        assert abs(ni - len(cpp)) <= 1
        np.testing.assert_allclose(err[0], cpp[0][0], atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(p[0, :2], cpp[0][1:3], atol=2e-3)
        lam_cpp = [row[3] for row in cpp]
        # lambda anneals per pair only while the pair iterates (it freezes
        # at convergence), so the schedule is comparable over the
        # iterations BOTH runs performed; the C++ count may be 1 larger.
        m = min(ni, len(lam_cpp), len(lam))
        np.testing.assert_allclose(lam[:m], lam_cpp[:m], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state.p[0, :2]), [-10.0, -5.0],
                               atol=5e-4)
