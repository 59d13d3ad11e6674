"""Video-stabilization-style demo: batched frame-to-keyframe registration.

The reference documents its API through notebooks
(/root/reference/test/inverse_compositional_algorithm.ipynb); this script
is the equivalent runnable walkthrough for the TPU-native engine, driving
the workload BASELINE.json calls out ("mosaicking / video stabilization
style workloads"): a jittered synthetic sequence is registered to its
first frame in ONE batched `align` call (every pair converges
independently on device), then re-rendered through the estimated warps.

Run:  python examples/stabilize.py [outdir]      (CPU or TPU)
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

import inverse_compositional_algorithm_tpu as ica
from inverse_compositional_algorithm_tpu.ops.pyramid import gaussian_blur
from inverse_compositional_algorithm_tpu.ops.transforms import (
    pad_params,
    transform_grid,
)
from inverse_compositional_algorithm_tpu.ops.warp import bicubic_sample


def make_sequence(n_frames: int = 8, h: int = 240, w: int = 320, seed: int = 0):
    """A smooth scene observed through a jittering euclidean camera."""
    rng = np.random.default_rng(seed)
    scene = gaussian_blur(
        jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32), 2.0)
    # random per-frame jitter: a few px of translation + ~0.5 deg of roll
    jitter = np.zeros((n_frames, 8), np.float32)
    jitter[1:, 0] = rng.uniform(-4, 4, n_frames - 1)
    jitter[1:, 1] = rng.uniform(-4, 4, n_frames - 1)
    jitter[1:, 2] = rng.uniform(-0.01, 0.01, n_frames - 1)
    gx, gy = transform_grid(
        pad_params(jnp.asarray(jitter), ica.TransformType.EUCLIDEAN),
        ica.TransformType.EUCLIDEAN, h, w)
    frames = bicubic_sample(jnp.broadcast_to(scene, (n_frames, h, w, 3)),
                            gx, gy)
    return frames, jitter


def main(outdir: str | None = None) -> None:
    frames, gt = make_sequence()
    n = frames.shape[0]
    print(f"backend: {jax.default_backend()}, frames: {frames.shape}")

    # Register every frame to the keyframe (frame 0) in one batched call.
    cfg = ica.AlignConfig(transform=ica.TransformType.EUCLIDEAN, nscales=3)
    key = jnp.broadcast_to(frames[:1], frames.shape)
    res = ica.align(frames, key, cfg)   # warp(frame_k) onto keyframe

    est = np.asarray(res.params(cfg))
    print("per-frame estimated [tx ty theta] vs ground-truth jitter:")
    for k in range(n):
        print(f"  frame {k}: est {np.round(est[k], 4)}  gt {gt[k, :3]}"
              f"  iters={int(res.niters[k])}"
              f"  diverged={bool(res.diverged[k])}")
    err = np.abs(est - gt[:, :3]).max()
    print(f"max parameter error: {err:.2e}")

    # Stabilized sequence = each frame warped back onto the keyframe grid.
    stabilized = np.asarray(res.iw)
    residual = np.nanmean(np.abs(np.asarray(res.di)), axis=(1, 2, 3))
    print("mean |frame - keyframe| after stabilization (0..255 scale):",
          [f"{v:.2e}" for v in residual])

    if outdir:
        import os

        from inverse_compositional_algorithm_tpu.utils.imageio import (
            save_image,
        )

        os.makedirs(outdir, exist_ok=True)
        for k in range(n):
            save_image(stabilized[k], os.path.join(outdir, f"stab_{k:03d}.png"))
        print(f"wrote {n} stabilized frames to {outdir}/")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
