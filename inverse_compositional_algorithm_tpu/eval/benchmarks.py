"""Throughput benchmark: batched pairs/second through the full pipeline.

Flagship configuration follows BASELINE.json: homography model, robust
(Charbonnier) IRLS, 5-scale pyramid, 584x388 RGB — the hardest config the
reference supports. The baseline anchor is the reference's own stored
measurement: its numpy L5 entry point needs 10.13 s for ONE pair at this
image size on the *cheapest* config (quadratic, translation, single scale —
reference test/inverse_compositional_algorithm.ipynb cell 14), i.e.
0.0987 pairs/s; the robust+homography+5-scale config it is compared against
here is strictly more work, so vs_baseline is a conservative lower bound.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import AlignConfig
from ..models.api import _align_batched
from ..ops.normal_equations import RobustLoss
from ..ops.pyramid import gaussian_blur
from ..ops.transforms import TransformType, pad_params, transform_grid
from ..ops.warp import bicubic_sample

# Reference numpy throughput anchor (pairs/s), see module docstring.
NUMPY_BASELINE_PAIRS_PER_SEC = 1.0 / 10.13

__all__ = ["make_bench_batch", "run_benchmark", "NUMPY_BASELINE_PAIRS_PER_SEC"]


def _base_image(height: int, width: int, dtype=jnp.float32):
    """Deterministic smooth test content in 0..255; falls back to synthetic
    texture so the bench runs without the reference checkout."""
    try:
        from ..utils.imageio import load_image

        img = load_image("/root/reference/test/data/rubber_whale.png")
        img = img[:height, :width]
        if img.shape[:2] == (height, width):
            return jnp.asarray(img, dtype)
    except Exception:
        pass
    rng = np.random.default_rng(0)
    noise = rng.uniform(0.0, 255.0, (height, width, 3)).astype(np.float32)
    return gaussian_blur(jnp.asarray(noise, dtype)[None], 2.0)[0]


def make_bench_batch(batch: int, height: int, width: int,
                     transform: TransformType, seed: int = 0):
    """[B,H,W,C] pair batch with per-pair random ground-truth motions of
    realistic magnitude (a few pixels at the borders)."""
    img = _base_image(height, width)
    rng = np.random.default_rng(seed)
    l = max(height, width)
    p = np.zeros((batch, 8), np.float32)
    p[:, :2] = rng.uniform(-3.0, 3.0, (batch, 2))
    if transform is TransformType.HOMOGRAPHY:
        p[:, [0, 1, 3, 4]] = rng.uniform(-2.0 / l, 2.0 / l, (batch, 4))
        p[:, 2] = rng.uniform(-3.0, 3.0, batch)
        p[:, 5] = rng.uniform(-3.0, 3.0, batch)
        p[:, 6:8] = rng.uniform(-2.0 / (l * l), 2.0 / (l * l), (batch, 2))
    elif transform is not TransformType.TRANSLATION:
        k = {TransformType.EUCLIDEAN: 1, TransformType.SIMILARITY: 2,
             TransformType.AFFINITY: 4}[transform]
        p[:, 2:2 + k] = rng.uniform(-2.0 / l, 2.0 / l, (batch, k))

    gx, gy = transform_grid(pad_params(jnp.asarray(p)), transform, height, width)
    i1 = bicubic_sample(jnp.broadcast_to(img[None], (batch, *img.shape)), gx, gy)
    i2 = jnp.broadcast_to(img[None], (batch, *img.shape))
    return i1, i2, p


def run_benchmark(batch: int = 16, height: int = 388, width: int = 584,
                  transform: TransformType = TransformType.HOMOGRAPHY,
                  robust: RobustLoss = RobustLoss.CHARBONNIER,
                  nscales: int = 5, repeats: int = 3,
                  config: AlignConfig | None = None) -> dict:
    """Compile, warm up, then time `repeats` full alignments of the batch.

    Returns the bench.py JSON record. Throughput counts wall time of the
    fully device-resident program (host->device transfers excluded by
    pre-placing inputs; every pair runs its full per-pair convergence)."""
    cfg = config or AlignConfig(transform=transform, robust=robust,
                                nscales=nscales)
    cfg.validate()
    if cfg.use_pallas and jax.default_backend() != "tpu":
        cfg = cfg.replace(use_pallas=False)
    i1, i2, _ = make_bench_batch(batch, height, width, transform)
    p0 = jnp.zeros((batch, 8), jnp.float32)
    i1, i2, p0 = jax.device_put((i1, i2, p0))

    res = _align_batched(i1, i2, p0, cfg)   # compile + warm up
    jax.block_until_ready(res.p)

    t0 = time.perf_counter()
    for _ in range(repeats):
        res = _align_batched(i1, i2, p0, cfg)
        jax.block_until_ready(res.p)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * repeats / dt
    mean_iters = float(np.asarray(res.niters, np.float64).mean())
    return {
        "metric": f"pairs/sec/chip ({transform.name.lower()}, "
                  f"{robust.name.lower()}, {nscales}-scale, {height}x{width})",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / NUMPY_BASELINE_PAIRS_PER_SEC, 1),
        "batch": batch,
        "seconds_per_batch": round(dt / repeats, 4),
        "mean_finest_iters": round(mean_iters, 1),
        "device": str(jax.devices()[0]).replace(" ", "_"),
    }
