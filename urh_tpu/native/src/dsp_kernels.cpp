// Native host DSP kernels (OpenMP).
//
// The TPU is the primary compute target, but when the chip sits behind
// a high-latency relay (dispatch overhead >> 100us) the adaptive
// placement (urh_tpu/util/placement.py) routes these stages to the
// host — where single-threaded NumPy leaves most cores idle.  These
// kernels are the parallel host twins for exactly those stages,
// mirroring the reference's use of OpenMP in its native layer
// (signal_functions.pyx:363, auto_interpretation.pyx:232).

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// Quadrature demodulation, float32 planes (semantics of
// urh_tpu/dsp/demod._afp_demod_np: sample-0 sentinel, noise gating on
// |x|^2, ASK = |x|/max_mag, FSK = discriminator atan2).
// mod: 0 = ASK (sentinel 0.0), 1 = FSK (sentinel -4.0).
void urh_afp_demod_f32(const float* iq, int64_t n, float noise_sqrd,
                       float max_mag, int mod, float* out) {
  if (n <= 0) return;
  const float sentinel = mod == 0 ? 0.0f : -4.0f;
  out[0] = sentinel;
#pragma omp parallel for schedule(static)
  for (int64_t i = 1; i < n; ++i) {
    const float re = iq[2 * i], im = iq[2 * i + 1];
    const float mag2 = re * re + im * im;
    if (mag2 <= noise_sqrd) {
      out[i] = sentinel;
    } else if (mod == 0) {
      out[i] = std::sqrt(mag2) / max_mag;
    } else {
      const float pr = iq[2 * (i - 1)], pi = iq[2 * (i - 1) + 1];
      out[i] = std::atan2(pr * im - pi * re, pr * re + pi * im);
    }
  }
}

// Full-window sliding median over rows: out[b, i] = median(rows[b, i:i+k])
// for i in [0, n-k+1).  float64 in, float32 out (the shrunk tail windows
// are handled by the Python caller).  One nth_element per window over a
// thread-local buffer, parallel over all windows.
void urh_median_full_windows(const double* rows, int64_t b, int64_t n,
                             int64_t k, float* out) {
  const int64_t full = n - k + 1;
  if (full <= 0 || k <= 0) return;
#pragma omp parallel
  {
    double* buf = new double[k];
#pragma omp for schedule(static) collapse(2)
    for (int64_t row = 0; row < b; ++row) {
      for (int64_t i = 0; i < full; ++i) {
        const double* src = rows + row * n + i;
        std::copy(src, src + k, buf);
        std::nth_element(buf, buf + k / 2, buf + k);
        out[row * full + i] = (float)buf[k / 2];
      }
    }
    delete[] buf;
  }
}

// NOTE: a native OpenMP carrier-synthesis kernel was measured here and
// removed: NumPy's SIMD sin/cos beats scalar libm sincosf even across
// OpenMP threads, so the host modulation twin threads NumPy ufuncs
// instead (dsp/modulate._carrier_into).

// Magnitude-squared of (N, 2) float32 planes (noise gating / power scan).
void urh_mag_squared_f32(const float* iq, int64_t n, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float re = iq[2 * i], im = iq[2 * i + 1];
    out[i] = re * re + im * im;
  }
}

}  // extern "C"
