"""Divergence guard, per-pair lambda annealing, and the coarse-level delta
cap (round-4 VERDICT items 2/8).

The reference applies every Gauss-Newton step unconditionally
(src/inverse_compositional_algorithm.py:220-259) and passes the same
boundary margin `delta` to every pyramid level (:340-372); a lost pair
there iterates to max_iter and, in a batched setting, would poison batch
statistics silently. Here: `effective_delta` keeps coarse levels usable,
`_lost_overlap` detects catastrophically lost warps, ic_solve reverts such
pairs to their warm start, deactivates them (so they stop dragging the
batched while_loop) and reports them via `diverged`.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from inverse_compositional_algorithm_tpu.config import AlignConfig
from inverse_compositional_algorithm_tpu.models.api import align
from inverse_compositional_algorithm_tpu.models.ic import (
    _lost_overlap,
    effective_delta,
    ic_solve,
)
from inverse_compositional_algorithm_tpu.ops.normal_equations import RobustLoss
from inverse_compositional_algorithm_tpu.ops.pyramid import gaussian_blur
from inverse_compositional_algorithm_tpu.ops.transforms import (
    TransformType,
    pad_params,
    transform_grid,
)
from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample
from inverse_compositional_algorithm_tpu import constants as cts


def _smooth(h, w, seed=0, b=1):
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), jnp.float32)
    return gaussian_blur(noise, 2.0)


def test_effective_delta_caps_small_levels():
    assert effective_delta(10, 388, 584) == 10          # full-res unchanged
    assert effective_delta(10, 97, 146) == 10           # golden 3-scale coarsest
    assert effective_delta(10, 16, 16) == 3             # 256^2 5-scale coarsest
    assert effective_delta(10, 25, 37) == 6             # bench 5-scale coarsest
    assert effective_delta(0, 16, 16) == 0


def test_lost_overlap_detector():
    h, w = 64, 96
    p = jnp.zeros((4, 8), jnp.float32)
    p = p.at[1, 0].set(3.0 * w)      # translation far beyond the frame
    p = p.at[2, 0].set(0.4 * w)      # large but overlapping: fine
    p = p.at[3, 1].set(jnp.nan)      # non-finite parameters
    bad = _lost_overlap(p, TransformType.TRANSLATION, h, w)
    np.testing.assert_array_equal(np.asarray(bad), [False, True, False, True])


def test_lost_overlap_homography_flip():
    # A homography whose denominator crosses zero inside the frame throws
    # probes to +/- huge coordinates; must be flagged.
    h, w = 64, 64
    p = jnp.zeros((1, 8), jnp.float32)
    p = p.at[0, 6].set(-0.1)   # denominator 1 - 0.1 x: zero at x = 10
    bad = _lost_overlap(p, TransformType.HOMOGRAPHY, h, w)
    # center probe maps to a finite but far point; corner (0,*) stays at
    # its own position -> still overlapping: NOT diverged.  Push harder:
    assert not bool(bad[0])
    p = p.at[0, 0].set(500.0).at[0, 2].set(5000.0)
    bad = _lost_overlap(p, TransformType.HOMOGRAPHY, h, w)
    assert bool(bad[0])


def test_guard_reverts_and_flags_lost_pair():
    """A pair warm-started far outside the frame must come back with
    diverged=True, p == its warm start, and an early loop exit."""
    h, w = 48, 64
    img = _smooth(h, w)
    p_gt = pad_params(jnp.asarray([[1.5, -1.0]], jnp.float32),
                      TransformType.TRANSLATION)
    gx, gy = transform_grid(p_gt, TransformType.TRANSLATION, h, w)
    i1 = jnp.concatenate([bicubic_sample(img, gx, gy), img])
    i2 = jnp.concatenate([img, img])
    p0 = jnp.zeros((2, 8), jnp.float32).at[1, 0].set(5.0 * w)

    s = ic_solve(i1, i2, p0, TransformType.TRANSLATION, delta=3)
    assert not bool(s.diverged[0]) and bool(s.diverged[1])
    # good pair converged to gt, lost pair reverted to its warm start
    np.testing.assert_allclose(np.asarray(s.p[0, :2]), [1.5, -1.0], atol=1e-2)
    np.testing.assert_allclose(np.asarray(s.p[1]), np.asarray(p0[1]))
    # the lost pair stopped immediately instead of burning max_iter
    assert int(s.niters[1]) <= 2
    # and did not hold the batch loop open
    assert int(s.niters[0]) < cts.MAX_ITER


def test_guard_off_reproduces_unguarded_behavior():
    h, w = 48, 64
    img = _smooth(h, w)
    i1 = i2 = img
    p0 = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(5.0 * w)
    s = ic_solve(i1, i2, p0, TransformType.TRANSLATION, delta=3,
                 divergence_guard=False)
    assert not bool(s.diverged[0])


def test_per_pair_lambda_freezes_on_convergence():
    """Identity pair converges immediately; its lambda must stop annealing
    while the other pair's lambda follows the 80 * 0.9^k schedule."""
    h, w = 48, 64
    img = _smooth(h, w)
    p_gt = pad_params(jnp.asarray([[2.5, -2.0]], jnp.float32),
                      TransformType.TRANSLATION)
    gx, gy = transform_grid(p_gt, TransformType.TRANSLATION, h, w)
    i1 = jnp.concatenate([img, bicubic_sample(img, gx, gy)])
    i2 = jnp.concatenate([img, img])
    p0 = jnp.zeros((2, 8), jnp.float32)

    state, (err_h, p_h, lam_h) = ic_solve(
        i1, i2, p0, TransformType.TRANSLATION, delta=3,
        robust=RobustLoss.CHARBONNIER, collect_trace=True)
    lam_h = np.asarray(lam_h)
    n0 = int(state.niters[0])
    n1 = int(state.niters[1])
    assert n0 < n1, "identity pair should converge first"
    # active pair follows the annealing schedule every iteration
    sched = [max(cts.LAMBDA_0 * cts.LAMBDA_RATIO ** (k + 1), cts.LAMBDA_N)
             for k in range(n1)]
    np.testing.assert_allclose(lam_h[:n1, 1], sched[:n1], rtol=1e-6)
    # converged pair's lambda frozen at its own last annealed value
    np.testing.assert_allclose(lam_h[n0:, 0], lam_h[n0, 0], rtol=0)


def test_align_reports_diverged_flag():
    h, w = 48, 64
    img = _smooth(h, w)
    cfg = AlignConfig(transform=TransformType.TRANSLATION, nscales=1,
                      delta=3, use_pallas=False)
    res = align(img, img, cfg, p0=jnp.asarray([5.0 * w, 0.0]))
    assert bool(res.diverged)
    res2 = align(img, img, cfg)
    assert not bool(res2.diverged)


@pytest.mark.parametrize("nscales", [1, 3])
def test_guard_does_not_perturb_healthy_runs(nscales):
    """With the guard on (default), healthy alignments are bit-identical to
    guard-off runs — the guard only touches pairs it fires on."""
    h, w = 64, 96
    img = _smooth(h, w, seed=3)
    p_gt = pad_params(jnp.asarray([[2.0, -1.5]], jnp.float32),
                      TransformType.TRANSLATION)
    gx, gy = transform_grid(p_gt, TransformType.TRANSLATION, h, w)
    i1 = bicubic_sample(img, gx, gy)
    cfg_on = AlignConfig(transform=TransformType.TRANSLATION,
                         nscales=nscales, use_pallas=False)
    cfg_off = cfg_on.replace(divergence_guard=False)
    r_on = align(i1, img, cfg_on)
    r_off = align(i1, img, cfg_off)
    np.testing.assert_array_equal(np.asarray(r_on.p), np.asarray(r_off.p))
    assert int(r_on.niters[0]) == int(r_off.niters[0])


def test_hard_motions_converge_without_false_freezes():
    """Bench-style hard mixed motions (scaled to a small frame) must all
    genuinely converge — the guard's speedup may not come from freezing
    recoverable pairs (round-4 honesty audit, see TPU_VALIDATION_r04)."""
    from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample

    h, w, b = 96, 144, 4
    img = _smooth(h, w, seed=11, b=1)
    rng = np.random.default_rng(5)
    l = max(h, w)
    # the bench's hard-motion magnitudes, expressed RELATIVE to the frame:
    # linear part +-0.06 (35/584), translation ~2.5% of the frame size
    p = np.zeros((b, 8), np.float32)
    p[:, [0, 1, 3, 4]] = rng.uniform(-0.06, 0.06, (b, 4))
    p[:, 2] = rng.uniform(-0.025 * l, 0.025 * l, b)
    p[:, 5] = rng.uniform(-0.025 * l, 0.025 * l, b)
    p[:, 6:8] = rng.uniform(-2.0 / (l * l), 2.0 / (l * l), (b, 2))
    gt = pad_params(jnp.asarray(p), TransformType.HOMOGRAPHY)
    gx, gy = transform_grid(gt, TransformType.HOMOGRAPHY, h, w)
    i2 = jnp.broadcast_to(img, (b, h, w, 3))
    i1 = bicubic_sample(i2, gx, gy)

    cfg = AlignConfig(transform=TransformType.HOMOGRAPHY, nscales=4,
                      robust=RobustLoss.CHARBONNIER, use_pallas=False)
    res = align(i1, i2, cfg)
    assert not np.asarray(res.diverged).any(), "guard must not fire here"
    err = np.abs(np.asarray(res.p) - p).max()
    assert err < 5e-3, f"hard motions failed to converge: max err {err}"
    assert (np.asarray(res.error) <= cfg.tol).all()
