"""Run the evaluation sweeps and record an EVAL_r*.json artifact.

Mirrors the reference's recorded notebook sweeps
(test/ica_keras_performance_tests_colab.ipynb cells 18/24/29): transform
sweep, robust-loss sweep, pyramid-depth sweep — accuracy (parameter-space
MSE/MAE/max), converged fraction, and throughput per configuration.

Run:  python -m inverse_compositional_algorithm_tpu.eval.run_eval [out.json]

Image set: the reference's Middlebury test images (584x388 RGB) when the
reference checkout is present, else a synthetic smooth-texture stack.
Images are center-cropped to 256x256 like the reference's evaluator and
replicated to the batch size.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

import jax

from ..config import AlignConfig
from ..ops.normal_equations import RobustLoss
from ..ops.transforms import TransformType
from .harness import (
    evaluate_pyramid_levels,
    evaluate_robust_losses,
    evaluate_transforms,
)

REF_IMAGES = ("rubber_whale.png", "dimetrodon.png", "hydrangea.png")
REF_DIR = "/root/reference/test/data"


def load_eval_images(batch: int = 8, size: int = 256) -> np.ndarray:
    """[batch, size, size, 3] float32 eval stack (reference data if present)."""
    imgs = []
    try:
        from ..utils.imageio import load_image

        for name in REF_IMAGES:
            path = os.path.join(REF_DIR, name)
            if not os.path.isfile(path):
                continue
            img = load_image(path)
            if img.ndim == 3 and img.shape[0] >= size and img.shape[1] >= size:
                y0 = (img.shape[0] - size) // 2
                x0 = (img.shape[1] - size) // 2
                imgs.append(np.asarray(img[y0:y0 + size, x0:x0 + size, :3],
                                       np.float32))
    except Exception:
        imgs = []
    if not imgs:
        from ..ops.pyramid import gaussian_blur
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        noise = rng.uniform(0, 255, (1, size, size, 3)).astype(np.float32)
        imgs = [np.asarray(gaussian_blur(jnp.asarray(noise), 2.0)[0])]
    stack = np.stack([imgs[i % len(imgs)] for i in range(batch)])
    return stack


def main(out_path: str | None = None) -> dict:
    from ..utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    images = load_eval_images()
    base = AlignConfig(transform=TransformType.EUCLIDEAN,
                       robust=RobustLoss.CHARBONNIER, nscales=3)

    record = {
        "device": str(jax.devices()[0]).replace(" ", "_"),
        "backend": jax.default_backend(),
        "images": list(images.shape),
        "magnitude_px": 3.0,
        "sweeps": {},
    }
    print("transform sweep (5 models)...", flush=True)
    record["sweeps"]["transforms"] = [
        dataclasses.asdict(r) for r in evaluate_transforms(images, base)]
    print("robust-loss sweep (5 losses)...", flush=True)
    record["sweeps"]["robust_losses"] = [
        dataclasses.asdict(r) for r in evaluate_robust_losses(images, base)]
    print("pyramid-depth sweep (3/4/5)...", flush=True)
    record["sweeps"]["pyramid_levels"] = [
        dataclasses.asdict(r)
        for r in evaluate_pyramid_levels(images, base)]
    # Stress sweep: ~10 px of border displacement with the full 5-scale
    # pyramid — the large-random-motion regime where the reference's
    # recorded eval (colab cell 18) reports MSE 75-208 with many
    # non-converged pairs.
    print("large-motion stress sweep (magnitude 10, 5 scales)...", flush=True)
    record["sweeps"]["transforms_large_motion"] = [
        dataclasses.asdict(r)
        for r in evaluate_transforms(images, base.replace(nscales=5),
                                     magnitude=10.0)]

    if out_path:
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {out_path}", flush=True)
    for sweep, rows in record["sweeps"].items():
        for r in rows:
            print(f"{sweep:16s} {r['transform']:12s} {r['robust']:20s} "
                  f"ns={r['nscales']} mae={r['mae']:.2e} "
                  f"max={r['max_err']:.2e} conv={r['converged_frac']:.2f} "
                  f"{r['pairs_per_sec']:.1f} pairs/s", flush=True)
    return record


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
