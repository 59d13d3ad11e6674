"""Shared per-tile bicubic warp core for the Pallas kernels.

One implementation of "warp an 8x128 output tile of a planar VMEM-resident
image" used by both ops/pallas/warp.py (standalone warp) and
ops/pallas/fused_iter.py (fused IC iteration) — the single source of truth
for band/tap logic (round-2 review flagged the hand-maintained duplicate).

Two per-tile execution paths, selected by an in-kernel predicate:

* FAST path — for smooth warps (the steady-state of every alignment):
  across the tile's 8 rows the integer x-taps move by at most one column,
  so the per-pixel 4-tap window is contained in 5 columns around
  min_r floor(gx). The kernel issues just FIVE shared lane-gathers of the
  whole [C*HB_FAST, TW] row band per tile (vs 4 per *output row* before,
  an ~6x cut in gathered volume), then per output row combines them with
  dense Keys weights: an x-weight FMA over the band and a dense y-weight
  reduction over band rows (no sublane gathers at all — the 4-tap y
  support falls out of Keys' |t|>=2 zeros). Boundary semantics stay exact:
  x taps are index-clipped like the reference (Neumann), bottom y taps
  land on pad_planar's duplicated edge rows, and top tap rows -1..-2 are
  folded into row 0 via the `extra` weight term, valid for gy >= -2 (the
  predicate enforces it; reference: src/bicubic_interpolation.py:8-23).

  Throughput bound worth knowing: the statically-unrolled 3-chunk tap
  pass covers an x-tap span of ~2.9 output tiles, i.e. x-minifications
  up to ~2.9x stay on the fast path; stronger minification (>~3x
  downscale in x — not produced by any alignment steady state, since the
  pyramid absorbs scale) drops those tiles to the exact general path
  below at ~5-10x the per-tile cost.

* GENERAL path — anything else (large rotations/shears, far out-of-domain
  rows): per output row, the image-clipped y-tap rows are covered by a
  loop over absolute HB-row segments; each segment does the 4-tap x-pass
  lane-gathers over its [C*HB, TW] band and sublane-gathers the y taps
  that logically belong to it (each tap belongs to exactly one segment).
  Smooth rows span ONE segment (the round-2 banded cost); arbitrary
  motion — 90-degree rotations, diverged homographies with the
  perspective denominator crossing zero mid-image — takes at most
  ceil(height/HB) segments for the affected rows and stays EXACT.

There is deliberately NO fallback path: the kernel is exact for every
input, so callers never wrap it in `lax.cond` (a data-dependent cond
around a pallas_call faulted the TPU runtime, and the round-2 predicate
was batch-global — one rotating pair collapsed the whole batch to a
530 ms XLA gather path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..warp import keys_cubic_weights

__all__ = ["TR", "TW", "HB", "HB_FAST", "keys_eval", "warp_tile",
           "padded_height", "ResidentImage", "WindowedImage"]

TR = 8        # output rows per tile (one vreg of sublanes)
TW = 128      # output cols per tile (lane dim)
HB = 32       # general-path band height (multiple of 8)
HB_FAST = 24  # fast-path band height (multiple of 8)


class ResidentImage:
    """Band access over a planar image fully resident in VMEM.

    The round-3 layout: BlockSpec keeps the whole [1, C, Hp, Wp] moving
    image in VMEM for the batch slice, so bands are plain slices. Only
    viable while the double-buffered plane fits the VMEM budget
    (ops/pallas/warp.py::plan_fast_warp)."""

    def __init__(self, ref):
        self.ref = ref                       # [1, C, Hp8, Wp]

    @property
    def hp8(self):
        return self.ref.shape[2]

    @property
    def wp(self):
        return self.ref.shape[3]

    def fast_cover(self, ym, hbf):
        return True                          # whole image is addressable

    def fast_band(self, ym, hbf, off, chans):
        return self.ref[0, :, pl.ds(ym, hbf), pl.ds(off, TW)].reshape(
            chans * hbf, TW)

    def general_band(self, base, hb, off, chans):
        return self.ref[0, :, pl.ds(base, hb), pl.ds(off, TW)].reshape(
            chans * hb, TW)


class WindowedImage:
    """Band access over an HBM-resident planar image through a prefetched
    VMEM row-band window (the large-frame streaming mode).

    The caller DMAs rows [ystart, ystart + wh) of the current pair into
    `win[slot]` ahead of compute (double-buffered across the grid); the
    fast path reads bands out of that window (fast_cover gates it), while
    the general path fetches its segment bands straight from HBM with a
    small synchronous DMA — exact for arbitrary motion, just slower, and
    rare by construction (the window is sized for the steady-state warp).
    """

    def __init__(self, win, slot, ystart, wh, img, b_idx, gband, gsem):
        self.win = win          # VMEM scratch [2, C, wh, Wp]
        self.slot = slot        # traced scalar in {0, 1}
        self.ystart = ystart    # traced scalar, 8-aligned window origin row
        self.wh = wh            # static window rows
        self.img = img          # ANY/HBM ref [B, C, Hp8, Wp]
        self.b_idx = b_idx      # traced scalar batch index
        self.gband = gband      # VMEM scratch [C, HB, TW]
        self.gsem = gsem        # DMA semaphore for gband

    @property
    def hp8(self):
        return self.img.shape[2]

    @property
    def wp(self):
        return self.img.shape[3]

    def fast_cover(self, ym, hbf):
        rel = ym - self.ystart
        return (rel >= 0) & (rel + hbf <= self.wh)

    def fast_band(self, ym, hbf, off, chans):
        # ym and ystart are both 8-aligned; tell Mosaic the difference is.
        rel = pl.multiple_of(ym - self.ystart, 8)
        return self.win[self.slot, :, pl.ds(rel, hbf), pl.ds(off, TW)].reshape(
            chans * hbf, TW)

    def general_band(self, base, hb, off, chans):
        cp = pltpu.make_async_copy(
            self.img.at[self.b_idx, :, pl.ds(base, hb), pl.ds(off, TW)],
            self.gband.at[:, pl.ds(0, hb), :],
            self.gsem,
        )
        cp.start()
        cp.wait()
        return self.gband[:, pl.ds(0, hb), :].reshape(chans * hb, TW)


def padded_height(height: int) -> int:
    """Planar padded row count: height + 2 duplicate edge rows (so bottom
    bicubic taps resolve to the Neumann clamp), rounded up to a sublane
    multiple so 8-aligned dynamic band slices can reach the bottom."""
    return -(-(height + 2) // 8) * 8


def lane_gather(band, li, rows):
    """Per-lane dynamic gather `band[r, li[r, x]]` -> [rows, TW].

    bf16 operands were A/B'd in round 5 (VERDICT item 1's "bf16 planar
    operands" candidate) and are UNSUPPORTED here: Mosaic's
    tpu.dynamic_gather rejects i32 indices with 16-bit data ("different
    bitwidths"), and the i16-index form (via a raw lax.gather, since
    jnp.take_along_axis force-converts indices to i32) fails with "8- and
    16-bit dynamic gather only supported along 2nd minor dimension" —
    lane-axis 16-bit gathers simply don't exist on this target, so the
    planar operands stay f32."""
    return jnp.take_along_axis(band, jnp.broadcast_to(li, (rows, TW)),
                               axis=1)


def keys_eval(t):
    """Keys (a=-0.5) cubic kernel evaluated at arbitrary offsets.

    K(t) = 1.5|t|^3-2.5|t|^2+1 for |t|<=1, -0.5|t|^3+2.5|t|^2-4|t|+2 for
    1<|t|<2, else 0 — the same basis as keys_cubic_weights (which is the
    factored 4-tap special case; reference
    src/keras-tf/tf_bicubic_interpolation.py:5-29).
    """
    a = jnp.abs(t)
    a2 = a * a
    near = (1.5 * a - 2.5) * a2 + 1.0
    far = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def warp_tile(gx, gy, img, write_row, *, height, width, chans,
              ablate: frozenset = frozenset()):
    """Bicubic-warp one 8x128 tile of a planar image.

    Args:
      gx, gy: [TR, TW] f32 source coordinates of the tile's pixels
        (edge-padded to full tiles by the caller, so every value is sane).
      img: a `ResidentImage` (whole plane in VMEM) or `WindowedImage`
        (HBM plane + prefetched VMEM row-band window) band-access adapter.
      write_row: callback (channel, row, values[1, TW]) storing one output
        row — lets each kernel direct output to its own ref layout.
      height, width: true image dims (tap clipping bounds).
      ablate: measurement-only cost attribution knobs (trace-time static;
        empty in production). Members may produce WRONG pixels — they exist
        to price individual stages of the fast path on real hardware:
        "chunk2"/"chunk1" truncate the 3-chunk tap-gather unroll, "nomask"
        drops the tap in-band select, "cheapwy" replaces the dense Keys
        y-weight evaluation with a linear map, "nofold" drops the top-row
        clamp fold.
    """
    f32 = jnp.float32
    hp8 = img.hp8
    # Bands never exceed the (padded) image height — short images just use
    # the whole image as the band.
    hb = min(HB, hp8)
    hbf = min(HB_FAST, hp8)

    x0f = jnp.floor(gx)
    y0f = jnp.floor(gy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    ymin = jnp.min(y0)
    ymax = jnp.max(y0)
    x0mn = jnp.min(x0, axis=0, keepdims=True)          # [1, TW]

    # Fast-path preconditions (see module docstring). Streaming adapters
    # additionally require the band to sit inside the prefetched window;
    # the statically-unrolled chunk pass covers an x-tap span of at most
    # 3 column chunks (|dgx/dx| up to ~2.9 — every non-degenerate warp).
    # Two band-height variants share one body: a 16-row band when the
    # tile's y-taps happen to fit it (~3/4 of smooth-warp tiles, decided
    # by the 8-alignment of the band origin) — 1/3 less gather + FMA
    # volume — and the 24-row band for the rest.
    xtap_lo = jnp.clip(jnp.min(x0) - 1, 0, width - 1)
    xtap_hi = jnp.clip(jnp.max(x0) + 2, 0, width - 1)
    fast_common = ((jnp.max(x0 - x0mn) <= 1)
                   & (ymin >= -2)
                   & (xtap_hi // TW - xtap_lo // TW <= 2))

    def fast_pred(hbf_t):
        ymf_t = (jnp.clip(ymin - 1, 0, hp8 - hbf_t) // 8) * 8
        ok = (fast_common
              & (ymax + 2 - ymf_t <= hbf_t - 1)
              & img.fast_cover(ymf_t, hbf_t))
        return ymf_t, ok

    hbf16 = min(16, hp8)
    ymf16, fast16 = fast_pred(hbf16)
    ymf, fast24 = fast_pred(hbf)
    if hbf16 == hbf:
        fast16 = jnp.zeros_like(fast16)      # degenerate short image
    fast24 = fast24 & ~fast16
    fast = fast16 | fast24

    ch = chans * hb

    def fast_body(ymf_t, hbf_t):
        chf = chans * hbf_t
        ym = pl.multiple_of(ymf_t, 8)
        # Five shared tap-column gathers for the whole tile, over a
        # STATICALLY-unrolled 3-chunk pass (a dynamic-trip fori_loop
        # defeats Mosaic's scheduling): chunk k reads at min(cs+k, last)
        # — out-of-span tap columns are masked off by `inb`, so the
        # clamped duplicate read contributes nothing.
        cxs = [jnp.clip(x0mn + j, 0, width - 1) for j in range(-1, 4)]
        cs = jnp.min(cxs[0]) // TW
        nch = img.wp // TW

        def chunk_at(c, gs, cxs=cxs):
            off = pl.multiple_of(jnp.minimum(c, nch - 1) * TW, TW)
            band = img.fast_band(ym, hbf_t, off, chans)
            if "rollgather" in ablate:
                # Measurement-only: price a roll+select tap pass (exact
                # only when the per-lane shift d = x0mn - x spans <= 2
                # values and no x-clip is active; WRONG pixels otherwise).
                # 6 per-tile dynamic lane-rotates + a 2-way select per tap
                # replace the 5 per-lane gathers.
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
                dm = x0mn - lane
                s = jnp.min(dm)
                m0 = jnp.broadcast_to(dm == s, (chf, TW))
                rs = [pltpu.roll(band, -(s + k - 1 - c * TW), 1)
                      for k in range(6)]
                out = []
                for j in range(5):
                    loc = cxs[j] - c * TW
                    inb = (loc >= 0) & (loc < TW)
                    t = jnp.where(m0, rs[j], rs[j + 1] if j + 1 < 6
                                  else rs[j])
                    out.append(gs[j] + jnp.where(inb, t, 0.0))
                return tuple(out)
            out = []
            for j in range(5):
                loc = cxs[j] - c * TW
                inb = (loc >= 0) & (loc < TW)
                li = jnp.clip(loc, 0, TW - 1)
                t = lane_gather(band, li, chf)
                if "nomask" in ablate:
                    out.append(gs[j] + t)
                else:
                    out.append(gs[j] + jnp.where(inb, t, 0.0))
            return tuple(out)

        # Static 3-chunk unroll. Two data-dependent reductions were
        # A/B-measured on chip and REJECTED: (a) a value-returning
        # lax.cond around the 3rd chunk (+0.1 ms — the scf.if phis the
        # five [C*band, 128] accumulators); (b) round 5: splitting the
        # fast tier into disjoint 2-chunk / 3-chunk pl.when bodies
        # (+0.34 ms — the 4-body duplication costs more in code/schedule
        # than the skipped chunk saves; post-epilogue-restructure the
        # 'chunk2' ablation itself saves ~0, the 3rd chunk hides in the
        # schedule). Keep it static.
        nchunk = 1 if "chunk1" in ablate else (2 if "chunk2" in ablate else 3)
        gs = tuple(jnp.zeros((chf, TW), f32) for _ in range(5))
        for k in range(nchunk):
            gs = chunk_at(cs + k, gs)

        xm = x0mn.astype(f32)
        ymf32 = ym.astype(f32)
        s_col = jax.lax.broadcasted_iota(
            jnp.int32, (hbf_t, TW), 0).astype(f32)
        for r in range(TR):
            gxr = gx[r : r + 1]
            gyr = gy[r : r + 1]
            # x-interpolated band F for this row: 5 dense FMAs.
            f = gs[0] * keys_eval(gxr - (xm - 1.0))
            for j in range(1, 5):
                f = f + gs[j] * keys_eval(gxr - (xm + (j - 1.0)))
            # Dense y weights over band rows; fold clipped top taps into
            # row 0 (only possible when the band starts at the image top).
            if "cheapwy" in ablate:
                wy = (gyr - (ymf32 + s_col)) * 0.01        # timing only
            else:
                wy = keys_eval(gyr - (ymf32 + s_col))      # [hbf_t, TW]
            # Clipped top taps (rows -1..-3, reachable for gy in [-2, 1))
            # all resolve to row 0 under the Neumann clamp; their weights
            # vanish identically for gy >= 1 so the fold is always safe.
            if "nofold" not in ablate:
                extra = jnp.where(
                    ym == 0,
                    keys_eval(gyr + 1.0) + keys_eval(gyr + 2.0)
                    + keys_eval(gyr + 3.0),
                    jnp.zeros_like(gyr))
                wy = jnp.concatenate([wy[:1] + extra, wy[1:]], axis=0)
            prod = f.reshape(chans, hbf_t, TW) * wy[None]
            vals = jnp.sum(prod, axis=1)                   # [chans, TW]
            for cc in range(chans):
                write_row(cc, r, vals[cc : cc + 1])

    @pl.when(fast16)
    def _fast16():
        fast_body(ymf16, hbf16)

    @pl.when(fast24)
    def _fast24():
        fast_body(ymf, hbf)

    @pl.when(jnp.logical_not(fast))
    def _general():
        wxs = keys_cubic_weights(gx - x0f)
        wys = keys_cubic_weights(gy - y0f)
        for r in range(TR):
            y0r = y0[r : r + 1]
            # Absolute tap rows, image-clipped (Neumann) — bounded even for
            # wildly out-of-domain coordinates, so the segment loop below
            # is bounded by ceil(height / HB) in the worst case.
            cty = [jnp.clip(y0r + (j - 1), 0, height - 1) for j in range(4)]
            gtx = [jnp.clip(x0[r : r + 1] + (i - 1), 0, width - 1)
                   for i in range(4)]
            wx4 = [wxs[i][r : r + 1] for i in range(4)]
            wy4 = [wys[j][r : r + 1] for j in range(4)]
            cs = jnp.min(gtx[0]) // TW
            ce = jnp.max(gtx[3]) // TW + 1
            # y-taps are covered by hb-row segments anchored at the row's
            # 8-aligned minimum tap (rows [ym_r + s*hb, ym_r + (s+1)*hb));
            # every tap belongs to exactly one logical segment, so
            # accumulating per segment is exact for ANY vertical span (no
            # band-overflow escape hatch needed). Rows with tap span
            # <= hb-8 (|dgy/dx| <~ (hb-11)/TW, ~9 degrees at hb=32) take a
            # SINGLE segment — the cost of a fixed per-row band; only
            # extreme rows loop, bounded by ceil(height/hb) segments.
            ym_r = (jnp.min(cty[0]) // 8) * 8
            smax = (jnp.max(cty[3]) - ym_r) // hb

            def seg_body(s, accs, cty=cty, gtx=gtx, wx4=wx4, wy4=wy4,
                         cs=cs, ce=ce, ym_r=ym_r):
                # Physical slice start: clamped so the hb-row read stays
                # inside the padded image; taps logically in segment s
                # still index within [0, hb) after the clamp (hp8 >=
                # height + 2 > any clipped tap row).
                base = jnp.minimum(ym_r + s * hb, hp8 - hb)
                base = pl.multiple_of(base, 8)

                def chunk_body(c, e, base=base):
                    off = pl.multiple_of(c * TW, TW)
                    band = img.general_band(base, hb, off, chans)
                    for i in range(4):
                        loc = gtx[i] - c * TW
                        inb = (loc >= 0) & (loc < TW)
                        li = jnp.clip(loc, 0, TW - 1)
                        g = lane_gather(band, li, ch)
                        e = e + g * jnp.where(inb, wx4[i], 0.0)
                    return e

                e_r = jax.lax.fori_loop(cs, ce, chunk_body,
                                        jnp.zeros((ch, TW), f32))
                out = []
                for cc in range(chans):
                    e_ch = e_r[cc * hb : (cc + 1) * hb]
                    acc = accs[cc]
                    for j in range(4):
                        inseg = ((cty[j] - ym_r) // hb) == s
                        loc = cty[j] - base
                        li = jnp.clip(loc, 0, hb - 1)
                        for sc in range(hb // 8):
                            src = e_ch[sc * 8 : (sc + 1) * 8]
                            lsc = li - sc * 8
                            inb = inseg & (lsc >= 0) & (lsc < 8)
                            g = jnp.take_along_axis(
                                src, jnp.broadcast_to(jnp.clip(lsc, 0, 7),
                                                      (8, TW)), axis=0)
                            acc = acc + g * jnp.where(inb, wy4[j], 0.0)
                    out.append(acc)
                return tuple(out)

            accs = jax.lax.fori_loop(
                0, smax + 1, seg_body,
                tuple(jnp.zeros((8, TW), f32) for _ in range(chans)))
            for cc in range(chans):
                write_row(cc, r, accs[cc][:1])


