// Native CPU kernels for the TPU-native inverse-compositional framework.
//
// Plays the role the reference implementation delegates to Numba-compiled
// kernels (reference: src/bicubic_interpolation.py:120-152 handwritten warp,
// src/transformation.py:143-186 projection, src/image_optimisation.py:158-194
// steepest-descent images): a portable, OpenMP-parallel native engine used
//  (a) as an accelerator-independent correctness oracle for the JAX/Pallas
//      path, and
//  (b) as a fast CPU fallback for driving/debugging without a TPU.
//
// Algomithmic semantics follow the IPOL "Inverse Compositional Algorithm
// for Parametric Registration" (2016.153): Keys cubic convolution with
// a = -0.5 (Catmull-Rom), Neumann (clip-to-edge) boundary taps, and the
// delta-margin domain test on the real-valued source coordinates.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Homogeneous 3x3 matrix from the padded 8-parameter vector; layouts match
// inverse_compositional_algorithm_tpu.ops.transforms.params_to_matrix.
// ttype: 1=translation 2=euclidean 3=similarity 4=affinity 5=homography.
struct Mat3 {
  double m[9];
};

Mat3 params_to_matrix(const double* p, int ttype) {
  Mat3 r{{1, 0, 0, 0, 1, 0, 0, 0, 1}};
  switch (ttype) {
    case 1:
      r.m[2] = p[0];
      r.m[5] = p[1];
      break;
    case 2: {
      const double c = std::cos(p[2]), s = std::sin(p[2]);
      r.m[0] = c; r.m[1] = -s; r.m[2] = p[0];
      r.m[3] = s; r.m[4] = c;  r.m[5] = p[1];
      break;
    }
    case 3:
      r.m[0] = 1 + p[2]; r.m[1] = -p[3];    r.m[2] = p[0];
      r.m[3] = p[3];     r.m[4] = 1 + p[2]; r.m[5] = p[1];
      break;
    case 4:
      r.m[0] = 1 + p[2]; r.m[1] = p[3];     r.m[2] = p[0];
      r.m[3] = p[4];     r.m[4] = 1 + p[5]; r.m[5] = p[1];
      break;
    case 5:
      r.m[0] = 1 + p[0]; r.m[1] = p[1];     r.m[2] = p[2];
      r.m[3] = p[3];     r.m[4] = 1 + p[4]; r.m[5] = p[5];
      r.m[6] = p[6];     r.m[7] = p[7];
      break;
    default:
      break;
  }
  return r;
}

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Keys a=-0.5 weights for fractional offset t in [0,1): taps floor-1..floor+2.
inline void keys_weights(double t, double w[4]) {
  const double t2 = t * t, t3 = t2 * t;
  w[0] = -0.5 * t3 + t2 - 0.5 * t;
  w[1] = 1.5 * t3 - 2.5 * t2 + 1.0;
  w[2] = -1.5 * t3 + 2.0 * t2 + 0.5 * t;
  w[3] = 0.5 * t3 - 0.5 * t2;
}

}  // namespace

extern "C" {

// Warp one image: img [H, W, C] row-major float32 -> out [H, W, C].
// Out-of-domain pixels (source within `delta` of the border) become NaN if
// nanifoutside, else 0 — the semantics of the reference's handwritten warp.
void ica_warp_bicubic(const float* img, int64_t h, int64_t w, int64_t c,
                      const double* p8, int ttype, int nanifoutside,
                      int delta, float* out) {
  const Mat3 mt = params_to_matrix(p8, ttype);
  const float fill = nanifoutside
      ? std::numeric_limits<float>::quiet_NaN() : 0.0f;
  const double d = static_cast<double>(delta);

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < h; ++i) {
    for (int64_t j = 0; j < w; ++j) {
      const double den = mt.m[6] * j + mt.m[7] * i + mt.m[8];
      const double gx = (mt.m[0] * j + mt.m[1] * i + mt.m[2]) / den;
      const double gy = (mt.m[3] * j + mt.m[4] * i + mt.m[5]) / den;
      float* o = out + (i * w + j) * c;
      const bool outside = gx < d || gx > (w - 1) - d ||
                           gy < d || gy > (h - 1) - d;
      if (outside) {
        for (int64_t k = 0; k < c; ++k) o[k] = fill;
        continue;
      }
      const double fx = std::floor(gx), fy = std::floor(gy);
      const int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
      double wx[4], wy[4];
      keys_weights(gx - fx, wx);
      keys_weights(gy - fy, wy);
      int xi[4], yi[4];
      for (int t = 0; t < 4; ++t) {
        xi[t] = clampi(x0 - 1 + t, 0, static_cast<int>(w) - 1);
        yi[t] = clampi(y0 - 1 + t, 0, static_cast<int>(h) - 1);
      }
      for (int64_t k = 0; k < c; ++k) {
        double acc = 0.0;
        for (int ty = 0; ty < 4; ++ty) {
          const float* row = img + (static_cast<int64_t>(yi[ty]) * w) * c;
          double rowacc = 0.0;
          for (int tx = 0; tx < 4; ++tx) {
            rowacc += wx[tx] * row[static_cast<int64_t>(xi[tx]) * c + k];
          }
          acc += wy[ty] * rowacc;
        }
        o[k] = static_cast<float>(acc);
      }
    }
  }
}

// Central-difference gradients with zero borders (reference semantics:
// src/inverse_compositional_algorithm.py:81-82).
void ica_gradients(const float* img, int64_t h, int64_t w, int64_t c,
                   float* ix, float* iy) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < h; ++i) {
    for (int64_t j = 0; j < w; ++j) {
      for (int64_t k = 0; k < c; ++k) {
        const int64_t idx = (i * w + j) * c + k;
        ix[idx] = (j > 0 && j < w - 1)
            ? 0.5f * (img[(i * w + j + 1) * c + k] -
                      img[(i * w + j - 1) * c + k])
            : 0.0f;
        iy[idx] = (i > 0 && i < h - 1)
            ? 0.5f * (img[((i + 1) * w + j) * c + k] -
                      img[((i - 1) * w + j) * c + k])
            : 0.0f;
      }
    }
  }
}

// Accumulate the 8x8 normal matrix and 8-vector from the five
// channel-reduced maps (same contraction as ops/normal_equations.py, raw
// unpreconditioned Jacobian columns).
void ica_normal_eq(const float* w1, const float* w2, const float* w3,
                   const float* wu, const float* wv, int64_t h, int64_t w,
                   int ttype, double* h_out, double* b_out) {
  const int64_t n = h * w;
  double hacc[64] = {0};
  double bacc[8] = {0};
#pragma omp parallel
  {
    double hloc[64] = {0};
    double bloc[8] = {0};
    double jx[8], jy[8];
#pragma omp for schedule(static)
    for (int64_t p = 0; p < n; ++p) {
      const double x = static_cast<double>(p % w);
      const double y = static_cast<double>(p / w);
      for (int q = 0; q < 8; ++q) jx[q] = jy[q] = 0.0;
      switch (ttype) {
        case 1: jx[0] = 1; jy[1] = 1; break;
        case 2: jx[0] = 1; jx[2] = -y; jy[1] = 1; jy[2] = x; break;
        case 3: jx[0] = 1; jx[2] = x; jx[3] = -y;
                jy[1] = 1; jy[2] = y; jy[3] = x; break;
        case 4: jx[0] = 1; jx[2] = x; jx[3] = y;
                jy[1] = 1; jy[4] = x; jy[5] = y; break;
        case 5: jx[0] = x; jx[1] = y; jx[2] = 1; jx[6] = -x * x;
                jx[7] = -x * y;
                jy[3] = x; jy[4] = y; jy[5] = 1; jy[6] = -x * y;
                jy[7] = -y * y; break;
        default: break;
      }
      const double a = w1[p], bqq = w2[p], cq = w3[p];
      const double uu = wu[p], vv = wv[p];
      for (int q = 0; q < 8; ++q) {
        const double p1 = a * jx[q] + bqq * jy[q];
        const double p2 = bqq * jx[q] + cq * jy[q];
        bloc[q] += uu * jx[q] + vv * jy[q];
        for (int m = 0; m < 8; ++m) {
          hloc[q * 8 + m] += p1 * jx[m] + p2 * jy[m];
        }
      }
    }
#pragma omp critical
    {
      for (int q = 0; q < 64; ++q) hacc[q] += hloc[q];
      for (int q = 0; q < 8; ++q) bacc[q] += bloc[q];
    }
  }
  for (int q = 0; q < 64; ++q) h_out[q] = hacc[q];
  for (int q = 0; q < 8; ++q) b_out[q] = bacc[q];
}

}  // extern "C"
