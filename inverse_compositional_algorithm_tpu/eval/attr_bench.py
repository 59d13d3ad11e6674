"""Cost attribution for the fused-iteration kernel (VERDICT r4 item 1).

Times `fused_iter_moments` under each measurement-only ablation knob
(`ops/pallas/tile_warp.warp_tile` / `fused_iter._iter_common` `ablate=`)
in ONE process, so numbers are comparable despite the tunneled chip's
~1.4x run-to-run variance. Each knob removes one suspected cost slice
(tap in-band masks, third chunk gather, dense Keys y-weights, moment
power matrices, rho', the whole epilogue, the whole warp); the deltas
against the unablated kernel price each stage of the ~2.5x gap between
the fused kernel and the measured same-volume VPU floor
(eval/benchmarks.vpu_floor).

Run:  python -m inverse_compositional_algorithm_tpu.eval.attr_bench
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.normal_equations import RobustLoss
from ..ops.transforms import TransformType, pad_params, transform_grid
from .benchmarks import make_bench_batch, vpu_floor

VARIANTS = [
    "",            # unablated fused kernel (baseline)
    "noepi",       # warp only: prices the epilogue by difference
    "epionly",     # epilogue only (reads stale scratch): prices the warp
    "nomask",      # drop the 15 per-tap in-band selects
    "chunk2",      # 2-chunk tap-gather unroll instead of 3
    "chunk1",      # 1-chunk unroll (lower bound on chunk cost)
    "cheapwy",     # linear y-weights instead of dense Keys on the band
    "nofold",      # drop the top-row clamp fold concat
    "cheapmom",    # skip the moment power-matrix construction
    "norho",       # linear rho' instead of the Charbonnier evaluation
    "rollgather",  # 6 dynamic lane-rotates + selects replace the 15 tap
    #                gathers (round-5: saves only 0.107 ms — the gathers
    #                are nearly free, the kernel is issue-bound)
    "nomask,chunk2,cheapwy,nofold",   # combined warp-side savings
]


def time_variant(plan, gx, gy, lam, height, width, robust, ablate,
                 k=12, k0=3):
    from ..ops.pallas.fused_iter import fused_iter_moments

    @partial(jax.jit, static_argnames=("k",))
    def scan_k(gx, gy, k: int):
        def step(acc, _):
            m = fused_iter_moments(
                plan.i2p, plan.tplp,
                gx + acc * 1e-12, gy, lam, height=height, width=width,
                robust=robust, nanifoutside=True, delta=10,
                stream=plan.stream, ablate=ablate)
            return acc + m.sum(), None

        return jax.lax.scan(step, jnp.float32(0.0), None, length=k)[0]

    float(scan_k(gx, gy, k0))
    float(scan_k(gx, gy, k))
    t0 = time.perf_counter()
    float(scan_k(gx, gy, k0))
    t1 = time.perf_counter()
    float(scan_k(gx, gy, k))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k - k0) * 1e3


def run(batch=16, height=388, width=584,
        transform=TransformType.HOMOGRAPHY,
        robust=RobustLoss.CHARBONNIER, variants=None):
    from ..models.ic import _masked_residual  # noqa: F401
    from ..ops.gradients import boundary_band_mask, central_gradients
    from ..ops.normal_equations import grad_moments
    from ..ops.pallas.fused_iter import plan_fused_iter

    i1, i2, p_gt = make_bench_batch(batch, height, width, transform)
    gx, gy = transform_grid(pad_params(jnp.asarray(p_gt)), transform,
                            height, width)
    ix, iy = central_gradients(i1)
    band = boundary_band_mask(height, width, 10).astype(jnp.float32)
    ix = ix * band[None, :, :, None]
    iy = iy * band[None, :, :, None]
    gxx, gxy, gyy = grad_moments(ix, iy)
    plan = plan_fused_iter(i1, i2, ix, iy, gxx, gxy, gyy, robust=True)
    assert plan is not None
    lam = jnp.full((batch,), 5.0, jnp.float32)

    rows = {}
    base = None
    for v in (variants or VARIANTS):
        ms = time_variant(plan, gx, gy, lam, height, width, robust, v)
        rows[v or "(full)"] = ms
        if v == "":
            base = ms
        tag = f"  ({base - ms:+.3f} vs full)" if base and v else ""
        print(f"{v or '(full)':<34} {ms:8.3f} ms/batch{tag}", flush=True)

    fl = vpu_floor(batch, height, width)["floor_ms_per_batch"]
    print(f"{'vpu_floor (same volume, static)':<34} {fl:8.3f} ms/batch"
          f"  (full/floor {rows['(full)'] / fl:.2f})", flush=True)
    rows["vpu_floor"] = fl
    return rows


if __name__ == "__main__":
    run()
