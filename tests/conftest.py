"""Test environment: virtual 8-device CPU mesh, x64 available.

Sharding / multi-chip logic is validated on a fake CPU device mesh (the
standard JAX pattern, see SURVEY.md §4); the driver separately dry-runs the
multi-chip path. These env vars must be set before jax imports.

TPU lane: ICA_TPU_TESTS=1 skips the CPU pin (and the x64 switch, which the
TPU backend lacks) so the same tests run on the real chip with the default
config's use_pallas=True — the accuracy stamp for the Pallas fast path:

    ICA_TPU_TESTS=1 python -m pytest tests/test_golden.py \
        tests/test_golden_traces.py tests/test_fused_iter.py -q

(Committed results in TPU_VALIDATION_r*.md.) Oracle-comparison tests that
need float64 or the 8-device mesh auto-skip on the single-chip lane.
"""

import os

TPU_LANE = os.environ.get("ICA_TPU_TESTS") == "1"

if not TPU_LANE:
    # NOTE: this environment may pin JAX_PLATFORMS to a TPU plugin via
    # sitecustomize; jax.config.update (below) takes precedence over the
    # env var, which a plain setdefault would not.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    # Unit-test oracles compare in float64; package code is dtype-explicit
    # so enabling x64 does not change the float32 production paths.
    jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    if not TPU_LANE:
        return
    skip = pytest.mark.skip(
        reason="needs float64 oracles / multi-device CPU mesh "
               "(not on the ICA_TPU_TESTS single-chip lane)")
    lane_files = {"test_golden.py", "test_golden_traces.py",
                  "test_fused_iter.py", "test_pallas_warp.py",
                  "test_pallas_normal_eq.py"}
    for item in items:
        if os.path.basename(str(item.fspath)) not in lane_files:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    XLA:CPU's compiler segfaults deterministically when the ~150th-plus
    executable of the suite is a large shard_map program (observed at
    tests/test_tiled.py's pyramidal compiles, 73% into the suite, across
    multiple runs and cache configurations; the same compiles succeed in
    a fresh process). Freeing the accumulated executables between
    modules keeps the process under whatever compiler-state limit is
    being hit. Costs a few re-compiles for shapes shared across modules.
    """
    yield
    jax.clear_caches()
    try:
        from inverse_compositional_algorithm_tpu.parallel.tiled import (
            _build_tiled_fn,
        )

        _build_tiled_fn.cache_clear()
    except Exception:
        pass


@pytest.fixture(scope="session")
def smooth_image():
    """Deterministic smooth RGB test image [140, 180, 3] in 0..255."""
    import jax.numpy as jnp
    from inverse_compositional_algorithm_tpu.ops.pyramid import gaussian_blur

    rng = np.random.default_rng(0)
    noise = rng.uniform(0.0, 255.0, (140, 180, 3)).astype(np.float32)
    return np.array(gaussian_blur(jnp.asarray(noise[None]), 3.0))[0]


def synth_pair(img, p, ttype):
    """(I1, I2) with exact ground truth p: I1 = img sampled at x'(x; p),
    I2 = img. The solver's fixed point is then exactly p (no boundary
    zero-fill artifacts; only edge-clipped taps within ~2 px of the border,
    which the delta band excludes)."""
    import jax.numpy as jnp
    from inverse_compositional_algorithm_tpu.ops.transforms import (
        pad_params, transform_grid,
    )
    from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample

    img = jnp.asarray(img, jnp.float32)
    h, w, _ = img.shape
    gx, gy = transform_grid(pad_params(jnp.asarray(p, jnp.float32))[None], ttype, h, w)
    i1 = bicubic_sample(img[None], gx, gy)[0]
    return np.array(i1), np.array(img)


@pytest.fixture(scope="session")
def make_pair(smooth_image):
    def _make(p, ttype):
        return synth_pair(smooth_image, p, ttype)

    return _make
