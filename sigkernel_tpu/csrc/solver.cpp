// Native CPU Goursat PDE solver.
//
// Plays the role of the reference's compiled Cython extension
// (reference sigkernel/cython_backend.pyx:7-176) as the host-side fast
// oracle: row-major sequential sweeps (cache-friendly on CPU, unlike the
// accelerator wavefront) with OpenMP parallelism over the batch/pair axis --
// the parallelism the reference left commented out (pyx:75,100).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

template <typename T>
inline T update_naive(T k00, T k01, T k10, T u) {
  return (k01 + k10) * (T(1) + T(0.5) * u) - k00;
}

template <typename T>
inline T update_order2(T k00, T k01, T k10, T u) {
  const T u2 = u * u * (T(1) / T(12));
  return (k01 + k10) * (T(1) + T(0.5) * u + u2) - k00 * (T(1) - u2);
}

// Solve one (MM, NN) increment grid into a (MM+1, NN+1) solution grid.
template <typename T, bool kNaive>
void solve_one(const T* inc, T* K, int64_t MM, int64_t NN) {
  const int64_t W = NN + 1;
  for (int64_t j = 0; j < W; ++j) K[j] = T(1);
  for (int64_t i = 1; i <= MM; ++i) {
    T* row = K + i * W;
    const T* prev = K + (i - 1) * W;
    const T* inc_row = inc + (i - 1) * NN;
    row[0] = T(1);
    for (int64_t j = 1; j <= NN; ++j) {
      const T u = inc_row[j - 1];
      row[j] = kNaive ? update_naive(prev[j - 1], prev[j], row[j - 1], u)
                      : update_order2(prev[j - 1], prev[j], row[j - 1], u);
    }
  }
}

template <typename T>
void solve_batch(const T* inc, T* out_grid, int64_t B, int64_t MM, int64_t NN,
                 int naive) {
  const int64_t in_stride = MM * NN;
  const int64_t out_stride = (MM + 1) * (NN + 1);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    if (naive)
      solve_one<T, true>(inc + b * in_stride, out_grid + b * out_stride, MM,
                         NN);
    else
      solve_one<T, false>(inc + b * in_stride, out_grid + b * out_stride, MM,
                          NN);
  }
}

// Fused kernel + first/second directional derivative solve (final values
// only). Recurrences follow the reference spec
// (reference sigkernel/cuda_backend.py:205-220).
template <typename T>
void solve_derivatives_one(const T* inc, const T* inc_d, const T* inc_dd,
                           T* K, T* D, T* S, int64_t MM, int64_t NN,
                           T* out_k, T* out_d, T* out_s) {
  const int64_t W = NN + 1;
  for (int64_t j = 0; j < W; ++j) {
    K[j] = T(1);
    D[j] = T(0);
    S[j] = T(0);
  }
  for (int64_t i = 1; i <= MM; ++i) {
    T* kr = K + (i % 2) * W;
    const T* kp = K + ((i - 1) % 2) * W;
    T* dr = D + (i % 2) * W;
    const T* dp = D + ((i - 1) % 2) * W;
    T* sr = S + (i % 2) * W;
    const T* sp = S + ((i - 1) % 2) * W;
    kr[0] = T(1);
    dr[0] = T(0);
    sr[0] = T(0);
    const T* ur = inc + (i - 1) * NN;
    const T* udr = inc_d + (i - 1) * NN;
    const T* uddr = inc_dd + (i - 1) * NN;
    for (int64_t j = 1; j <= NN; ++j) {
      const T u = ur[j - 1], ud = udr[j - 1], udd = uddr[j - 1];
      const T k00 = kp[j - 1], k01 = kp[j], k10 = kr[j - 1];
      const T d00 = dp[j - 1], d01 = dp[j], d10 = dr[j - 1];
      const T s00 = sp[j - 1], s01 = sp[j], s10 = sr[j - 1];

      const T k = update_order2(k00, k01, k10, u);

      const T f1 = k00 * ud + d00 * u;
      const T f2 = k01 * ud + d01 * u;
      const T f3 = k10 * ud + d10 * u;
      const T f4 = k * ud + (d01 + d10 - d00 + f1) * u;
      const T d = d01 + d10 - d00 + T(0.25) * (f1 + f2 + f3 + f4);

      const T g1 = k00 * udd + T(2) * d00 * ud + s00 * u;
      const T g2 = k01 * udd + T(2) * d01 * ud + s01 * u;
      const T g3 = k10 * udd + T(2) * d10 * ud + s10 * u;
      const T g4 = k * udd + T(2) * d * ud + (s01 + s10 - s00 + g1) * u;
      const T s = s01 + s10 - s00 + T(0.25) * (g1 + g2 + g3 + g4);

      kr[j] = k;
      dr[j] = d;
      sr[j] = s;
    }
  }
  const int64_t last = (MM % 2) * W;
  *out_k = K[last + NN];
  *out_d = D[last + NN];
  *out_s = S[last + NN];
}

}  // namespace

extern "C" {

// inc: (B, MM, NN) row-major; out_grid: (B, MM+1, NN+1)
void sig_solve_f64(const double* inc, double* out_grid, int64_t B, int64_t MM,
                   int64_t NN, int naive) {
  solve_batch<double>(inc, out_grid, B, MM, NN, naive);
}

void sig_solve_f32(const float* inc, float* out_grid, int64_t B, int64_t MM,
                   int64_t NN, int naive) {
  solve_batch<float>(inc, out_grid, B, MM, NN, naive);
}

// Fused triple solve, final corner values only.
// inc*, : (B, MM, NN); out_*: (B,)
// scratch-free: uses two-row rolling buffers allocated per thread.
void sig_solve_derivatives_f64(const double* inc, const double* inc_d,
                               const double* inc_dd, double* out_k,
                               double* out_d, double* out_s, int64_t B,
                               int64_t MM, int64_t NN) {
  const int64_t stride = MM * NN;
  const int64_t W = NN + 1;
#pragma omp parallel
  {
    double* K = new double[2 * W];
    double* D = new double[2 * W];
    double* S = new double[2 * W];
#pragma omp for schedule(static)
    for (int64_t b = 0; b < B; ++b) {
      solve_derivatives_one<double>(inc + b * stride, inc_d + b * stride,
                                    inc_dd + b * stride, K, D, S, MM, NN,
                                    out_k + b, out_d + b, out_s + b);
    }
    delete[] K;
    delete[] D;
    delete[] S;
  }
}

int sig_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
