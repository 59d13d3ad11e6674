"""Throughput benchmark: batched pairs/second through the full pipeline.

Flagship configuration follows BASELINE.json: homography model, robust
(Charbonnier) IRLS, 5-scale pyramid, 584x388 RGB — the hardest config the
reference supports. The baseline anchor is the reference's own stored
measurement: its numpy L5 entry point needs 10.13 s for ONE pair at this
image size on the *cheapest* config (quadratic, translation, single scale —
reference test/inverse_compositional_algorithm.ipynb cell 14), i.e.
0.0987 pairs/s; the robust+homography+5-scale config it is compared against
here is strictly more work, so vs_baseline is a conservative lower bound.

Timing methodology (important on tunneled/remote TPU backends): a naive
dispatch-and-block loop measures only dispatch/RTT, not device work —
`block_until_ready` on some remote transports returns before the device
has executed, and repeated identical executions can be deduplicated. We
therefore time K complete alignments executed *on device* inside one
jitted `lax.scan` (each step gets a fresh warm-start perturbation and a
per-step image scaling so no step is loop-invariant and nothing can be
hoisted or deduplicated), fetch one scalar checksum, and report the
two-point difference (t(K) - t(K0)) / (K - K0) — which cancels the
transport round-trip and any constant dispatch overhead exactly.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import AlignConfig
from ..models.api import _align_impl
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
                     transform: TransformType, seed: int = 0,
                     hard: bool = False):
    """[B,H,W,C] pair batch with per-pair random ground-truth motions.

    hard=False: realistic small motions (a few pixels at the borders) —
    the steady-state video-alignment regime. hard=True: large mixed
    motions (tens of pixels of translation, rotation-scale linear parts up
    to ~0.06, i.e. tens of pixels of border displacement) that stress the
    coarse pyramid levels and the solvers' full iteration budget."""
    img = _base_image(height, width)
    rng = np.random.default_rng(seed)
    l = max(height, width)
    tr, lin = (15.0, 35.0 / l) if hard else (3.0, 2.0 / l)
    p = np.zeros((batch, 8), np.float32)
    p[:, :2] = rng.uniform(-tr, tr, (batch, 2))
    if transform is TransformType.HOMOGRAPHY:
        p[:, [0, 1, 3, 4]] = rng.uniform(-lin, lin, (batch, 4))
        p[:, 2] = rng.uniform(-tr, tr, batch)
        p[:, 5] = rng.uniform(-tr, tr, batch)
        p[:, 6:8] = rng.uniform(-2.0 / (l * l), 2.0 / (l * l), (batch, 2))
    elif transform is not TransformType.TRANSLATION:
        k = {TransformType.EUCLIDEAN: 1, TransformType.SIMILARITY: 2,
             TransformType.AFFINITY: 4}[transform]
        p[:, 2:2 + k] = rng.uniform(-lin, lin, (batch, k))

    gx, gy = transform_grid(pad_params(jnp.asarray(p)), transform, height, width)
    i1 = bicubic_sample(jnp.broadcast_to(img[None], (batch, *img.shape)), gx, gy)
    i2 = jnp.broadcast_to(img[None], (batch, *img.shape))
    return i1, i2, p


@partial(jax.jit, static_argnames=("cfg", "k"))
def _bench_scan(i1, i2, p0s, scales, cfg, k: int):
    """Run k full alignments on device; returns (checksum, niters[k, B]).

    Each step perturbs the warm start (p0s[j]) and scales the images by
    scales[j] (= 1 +/- 1e-6), so no step's computation is loop-invariant:
    the pyramid build, every solver iteration, and the final warp all
    execute k times on device.
    """
    def step(acc, xs):
        p0, s = xs
        r = _align_impl(i1 * s, i2 * s, p0, cfg)
        return acc + r.p.sum() + r.error.sum(), r.niters

    acc, nit = jax.lax.scan(step, jnp.float32(0.0),
                            (p0s[:k], scales[:k]))
    return acc, nit


def _measure(i1, i2, cfg, batch, repeats, repeats0, nsamples: int = 3):
    """(pairs_per_sec, seconds_per_batch, mean_finest_iters, samples) of
    the full alignment via the two-point on-device scan.

    The tunneled chip shows ~1.4x whole-run variance (PERF.md), so ONE
    two-point sample per metric made cross-round comparison +-40%; here
    `nsamples` independent two-point measurements run back-to-back in the
    same process and the headline value is their MEDIAN, with
    min/median/max returned for the machine record (VERDICT r4 item 5).
    """
    rng = np.random.default_rng(1)
    # Perturb ONLY the translation slots: +-1e-4 px is physically
    # negligible at any frame size, which is all the perturbation is for
    # (defeating scan-step deduplication). A uniform +-1e-4 across all 8
    # params is NOT negligible for homography — p6/p7 have natural
    # magnitude ~1/L^2 (~1e-6), so +-1e-4 there warps borders by ~100 px
    # at 720p and the "warm start" becomes a large-motion solve.
    p0s = np.zeros((repeats, batch, 8), np.float32)
    p0s[:, :, :2] = rng.uniform(-1e-4, 1e-4, (repeats, batch, 2))
    p0s = jnp.asarray(p0s)
    scales = jnp.asarray(1.0 + rng.uniform(-1e-6, 1e-6, repeats), jnp.float32)
    i1, i2, p0s, scales = jax.device_put((i1, i2, p0s, scales))

    # Compile + warm up both program sizes (and populate any remote caches).
    float(_bench_scan(i1, i2, p0s, scales, cfg, repeats0)[0])
    acc, nit = _bench_scan(i1, i2, p0s, scales, cfg, repeats)
    float(acc)

    per_batch_samples = []
    for _ in range(max(1, nsamples)):
        t0 = time.perf_counter()
        float(_bench_scan(i1, i2, p0s, scales, cfg, repeats0)[0])
        t1 = time.perf_counter()
        acc, nit = _bench_scan(i1, i2, p0s, scales, cfg, repeats)
        float(acc)
        t2 = time.perf_counter()
        per_batch_samples.append(((t2 - t1) - (t1 - t0))
                                 / (repeats - repeats0))

    per_batch = float(np.median(per_batch_samples))
    samples = {
        "pairs_per_sec_min": round(batch / max(per_batch_samples), 3),
        "pairs_per_sec_median": round(batch / per_batch, 3),
        "pairs_per_sec_max": round(batch / min(per_batch_samples), 3),
        "n": len(per_batch_samples),
    }
    return (batch / per_batch, per_batch,
            float(np.asarray(nit, np.float64).mean()), samples)


def _two_point_ms(run_k, k: int = 12, k0: int = 3, nsamples: int = 3):
    """(median ms-per-unit, {min, median, max, n}) of `nsamples`
    back-to-back two-point on-device-scan measurements; run_k(k) must
    block on a k-step scan's scalar result."""
    run_k(k0)
    run_k(k)
    ms = []
    for _ in range(max(1, nsamples)):
        t0 = time.perf_counter()
        run_k(k0)
        t1 = time.perf_counter()
        run_k(k)
        t2 = time.perf_counter()
        ms.append(((t2 - t1) - (t1 - t0)) / (k - k0) * 1e3)
    med = float(np.median(ms))
    return med, {"ms_min": round(min(ms), 3), "ms_median": round(med, 3),
                 "ms_max": round(max(ms), 3), "n": len(ms)}


def hbm_peak_gbs() -> tuple[float, str]:
    """(peak HBM GB/s, provenance) for the device running the bench.

    Public per-generation figures; device kinds not in the table fall back
    to the v5e number so pct_hbm_peak stays comparable across rounds, with
    the provenance string flagging the assumption.
    """
    kind = getattr(jax.devices()[0], "device_kind", "") or ""
    table = {
        "TPU v4": 1228.0,
        "TPU v5 lite": 819.0,
        "TPU v5e": 819.0,
        "TPU v5": 2765.0,     # v5p
        "TPU v6 lite": 1640.0,  # v6e / Trillium
    }
    for name, peak in table.items():
        if kind.startswith(name):
            return peak, kind
    return 819.0, f"assumed v5e (unknown device kind {kind!r})"


def kernel_roofline(batch: int, height: int, width: int,
                    transform: TransformType, robust: RobustLoss) -> dict:
    """Roofline accounting for the fused-iteration hot kernel.

    Times fused_iter_moments at the bench shape (two-point on-device scan)
    and reports achieved HBM bandwidth vs the peak of the device actually
    running the bench (derived from the device kind, recorded in the JSON;
    unknown kinds fall back to the v5e figure and say so). The byte model
    counts each operand plane once per kernel invocation: the resident
    planar moving image + the per-tile-streamed template/gradient/moment
    planes + the coordinate fields + the [B,K,8,8] output.

    The kernel is VPU-bound by design (per-lane tap gathers + dense Keys
    FMAs), so %-of-HBM-peak far below 100 is expected; the number exists
    to quantify the gap the north star asks about (BASELINE.json).
    """
    from functools import partial as _partial

    from ..models.ic import _masked_residual  # noqa: F401 (docs parity)
    from ..ops.gradients import boundary_band_mask, central_gradients
    from ..ops.normal_equations import grad_moments
    from ..ops.pallas.fused_iter import fused_iter_moments, plan_fused_iter
    from ..ops.transforms import pad_params, transform_grid

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

    @_partial(jax.jit, static_argnames=("k",))
    def scan_k(gx, gy, k: int):
        def step(acc, _):
            m = fused_iter_moments(
                plan.i2p, plan.tplp,
                gx + acc * 1e-12, gy, lam, height=height, width=width,
                robust=robust, nanifoutside=True, delta=10)
            return acc + m.sum(), None

        return jax.lax.scan(step, jnp.float32(0.0), None, length=k)[0]

    ms, samp = _two_point_ms(lambda k: float(scan_k(gx, gy, k)))

    _, c, hp8, wp = plan.i2p.shape
    nplanes = 3 * c + 3
    bytes_per_pair = (c * hp8 * wp + nplanes * hp8 * wp
                      + 2 * height * width) * 4
    gbs = bytes_per_pair * batch / (ms * 1e-3) / 1e9
    peak, peak_src = hbm_peak_gbs()
    return {
        "fused_iter_ms_per_batch": round(ms, 3),
        "fused_iter_samples": samp,
        "fused_iter_gbs": round(gbs, 1),
        "hbm_peak_gbs": peak,
        "hbm_peak_source": peak_src,
        "pct_hbm_peak": round(100.0 * gbs / peak, 1),
    }


def vpu_floor(batch: int, height: int, width: int) -> dict:
    """MEASURED per-tile VPU floor for the fused iteration's fast path.

    A stripped Pallas kernel with exactly the fast path's data-movement and
    arithmetic volume — per 8x128 tile: 2 column chunks x 5 shared
    lane-gathers of the [C*HB_FAST, 128] band, then per output row 5 Keys
    evaluations on [1,128], 5 dense FMAs over the band and the dense
    y-weight reduction — but with STATIC indices/weights (no coordinate
    math, no predicates, no tap clipping). The ratio fused/floor is the
    price of the real warp logic; round 3 asserted "within ~2x" without a
    number (VERDICT r3 weak item 4) — this records it.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas.tile_warp import HB_FAST, TR, TW, keys_eval
    from ..ops.pallas.warp import pad_planar

    i1, _, _ = make_bench_batch(batch, height, width,
                                TransformType.TRANSLATION)
    img_p = pad_planar(i1)
    b, c, hp8, wp = img_p.shape
    hbf = min(HB_FAST, hp8)
    chf = c * hbf
    hp = -(-height // TR) * TR
    wg = -(-width // TW) * TW

    def kernel(img_ref, out_ref):
        f32 = jnp.float32
        li = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
        frac = li.astype(f32) * (1.0 / TW)

        def chunk_body(ci, gs):
            off = pl.multiple_of(ci * TW, TW)
            band = img_ref[0, :, pl.ds(0, hbf), pl.ds(off, TW)].reshape(
                chf, TW)
            out = []
            for j in range(5):
                t = jnp.take_along_axis(
                    band, jnp.broadcast_to(jnp.clip(li + j, 0, TW - 1),
                                           (chf, TW)), axis=1)
                out.append(gs[j] + t)
            return tuple(out)

        gs = jax.lax.fori_loop(
            0, 2, chunk_body,
            tuple(jnp.zeros((chf, TW), f32) for _ in range(5)))
        s_col = jax.lax.broadcasted_iota(jnp.int32, (hbf, TW), 0).astype(f32)
        for r in range(TR):
            f = gs[0] * keys_eval(frac - 1.0)
            for j in range(1, 5):
                f = f + gs[j] * keys_eval(frac + (j - 1.0) * 0.5)
            wy = keys_eval((frac + r) * 0.25 - s_col * 0.1)
            prod = f.reshape(c, hbf, TW) * wy[None]
            vals = jnp.sum(prod, axis=1)
            for cc in range(c):
                out_ref[0, cc, r, :] = vals[cc : cc + 1][0]

    @partial(jax.jit, static_argnames=("k",))
    def scan_k(img_p, k: int):
        def step(acc, _):
            out = pl.pallas_call(
                kernel,
                grid=(b, hp // TR, wg // TW),
                in_specs=[pl.BlockSpec((1, c, hp8, wp),
                                       lambda bb, ty, tx: (bb, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, c, TR, TW),
                                       lambda bb, ty, tx: (bb, 0, ty, tx),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, c, hp, wg), jnp.float32),
            )(img_p + acc * 1e-12)
            return acc + out[0, 0, 0, 0], None

        return jax.lax.scan(step, jnp.float32(0.0), None, length=k)[0]

    ms, samp = _two_point_ms(lambda k: float(scan_k(img_p, k)))
    return {"floor_ms_per_batch": round(ms, 3), "floor_samples": samp}


def run_benchmark(batch: int = 8, height: int = 388, width: int = 584,
                  transform: TransformType = TransformType.HOMOGRAPHY,
                  robust: RobustLoss = RobustLoss.CHARBONNIER,
                  nscales: int = 5, repeats: int = 4, repeats0: int = 1,
                  config: AlignConfig | None = None,
                  full: bool = True) -> dict:
    """Measure device throughput of `repeats` full alignments of the batch.

    Returns the bench.py JSON record. Throughput is computed from the
    two-point difference between a `repeats`-step and a `repeats0`-step
    on-device scan (see module docstring), so transport round-trips,
    host<->device transfers and dispatch overhead cancel; every pair runs
    its full per-pair convergence in every counted step.

    batch=8 is the measured per-chip throughput peak (PERF.md round-5
    batch sweep: 480 pairs/s at 8 vs 457 at 16 vs 415 at 64 — the
    coarsest-level while_loop trip tail grows with batch); large pair
    sets scale across chips via parallel/sharded.py rather than by
    growing the per-chip batch.

    With full=True the record also carries (round-2 review items):
      * a hard-motion line (large mixed motions incl. rotations) so
        pairs/s is not flattered by near-instant convergence;
      * a fixed-iteration line (tol ~ 0 -> every pair runs MAX_ITER at
        every scale) pinning the pure per-iteration cost;
      * the fused-kernel roofline (achieved GB/s, % of HBM peak).
    """
    assert repeats > repeats0 >= 1
    cfg = config or AlignConfig(transform=transform, robust=robust,
                                nscales=nscales)
    cfg.validate()
    if cfg.use_pallas and jax.default_backend() != "tpu":
        cfg = cfg.replace(use_pallas=False)
    i1, i2, _ = make_bench_batch(batch, height, width, transform)
    pps, per_batch, mean_iters, samp = _measure(i1, i2, cfg, batch, repeats,
                                                repeats0)
    rec = {
        "metric": f"pairs/sec/chip ({transform.name.lower()}, "
                  f"{robust.name.lower()}, {nscales}-scale, {height}x{width})",
        "value": round(pps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pps / NUMPY_BASELINE_PAIRS_PER_SEC, 1),
        "batch": batch,
        "seconds_per_batch": round(per_batch, 4),
        "mean_finest_iters": round(mean_iters, 1),
        "samples": samp,
        "device": str(jax.devices()[0]).replace(" ", "_"),
        "timing": "on-device scan, two-point (RTT-cancelled), "
                  "median of in-run samples",
    }
    if not full:
        return rec

    i1h, i2h, _ = make_bench_batch(batch, height, width, transform,
                                   seed=7, hard=True)
    pps_h, _, it_h, samp_h = _measure(i1h, i2h, cfg, batch, repeats, repeats0)
    rec["hard_motion"] = {"pairs_per_sec": round(pps_h, 3),
                          "vs_baseline": round(
                              pps_h / NUMPY_BASELINE_PAIRS_PER_SEC, 1),
                          "mean_finest_iters": round(it_h, 1),
                          "samples": samp_h}

    cfg_fix = cfg.replace(tol=1e-9)
    pps_f, sec_f, it_f, samp_f = _measure(i1, i2, cfg_fix, batch, repeats,
                                          repeats0)
    rec["fixed_30_iters"] = {"pairs_per_sec": round(pps_f, 3),
                             "seconds_per_batch": round(sec_f, 4),
                             "mean_finest_iters": round(it_f, 1),
                             "samples": samp_f}

    rec["roofline"] = kernel_roofline(batch, height, width, transform,
                                      robust)
    fl = vpu_floor(batch, height, width)
    fl["fused_over_floor"] = round(
        rec["roofline"]["fused_iter_ms_per_batch"]
        / max(fl["floor_ms_per_batch"], 1e-9), 2)
    rec["vpu_floor"] = fl

    # Large-frame lines (VERDICT r3 item 1): 720p / 1080p RGB through the
    # full pipeline — the finest pyramid levels exceed the VMEM-residency
    # budget and run the HBM-streaming fused path (plan_warp_mode ==
    # "stream"), NOT an XLA-gather fallback. px_rate = pairs/s * megapixels
    # should stay roughly flat vs the 584x388 headline if scaling is
    # ~linear in pixel count.
    base_px_rate = pps * (height * width) / 1e6
    rec["large_frame"] = {}
    for (lh, lw, lb) in ((720, 1280, 4), (1080, 1920, 2), (2160, 3840, 1)):
        i1l, i2l, _ = make_bench_batch(lb, lh, lw, transform, seed=3)
        pps_l, sec_l, it_l, samp_l = _measure(i1l, i2l, cfg, lb, repeats,
                                              repeats0)
        px = lh * lw / 1e6
        rec["large_frame"][f"{lw}x{lh}"] = {
            "pairs_per_sec": round(pps_l, 3),
            "seconds_per_batch": round(sec_l, 4),
            "batch": lb,
            "mean_finest_iters": round(it_l, 1),
            "mpix_pairs_per_sec": round(pps_l * px, 2),
            "vs_headline_px_rate": round(pps_l * px / base_px_rate, 3),
            "samples": samp_l,
        }
    return rec
