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

// Fused demod + symbolize + peak for the streaming host path
// (urh_tpu/protocol/stream.StreamDemodulator._host_block semantics,
// itself the host twin of the fused device block program):
//   state[i] = PAUSE (-1)            if |x[i]|^2 <= noise_sqrd
//            = #(thresholds < val)   otherwise
// with val = |x|/max_mag (ASK, mod=0) or the quadrature discriminator
// atan2 (FSK, mod=1); binary FSK at threshold 0 decides on the cross
// product's sign without the arctangent (atan2(y,x) > 0 <=> y > 0, or
// y == +0 with x negative — signed-zero/pi branches included).
// prev (2 floats) is the previous chunk's last sample or null at
// stream start, where sample 0 is forced PAUSE (afp_demod convention).
// Returns the peak |x|^2 over the chunk through peak_out.
extern "C" void urh_block_states_f32(
                          const float* iq, int64_t n, const float* prev,
                          float noise_sqrd, float max_mag, int mod,
                          const float* thresholds, int n_thr,
                          int8_t* states, float* peak_out) {
  if (n <= 0) { *peak_out = 0.0f; return; }
  const bool binary_fsk =
      mod == 1 && n_thr == 1 && thresholds[0] == 0.0f;
  float peak = 0.0f;
#pragma omp parallel for schedule(static) reduction(max : peak)
  for (int64_t i = 0; i < n; ++i) {
    const float re = iq[2 * i], im = iq[2 * i + 1];
    const float mag2 = re * re + im * im;
    peak = std::max(peak, mag2);
    if (mag2 <= noise_sqrd) {
      states[i] = -1;
      continue;
    }
    int8_t state;
    if (mod == 0) {
      const float val = std::sqrt(mag2) / max_mag;
      int s = 0;
      for (int k = 0; k < n_thr; ++k) s += val > thresholds[k];
      state = (int8_t)s;
    } else {
      const float pr = i ? iq[2 * (i - 1)] : (prev ? prev[0] : re);
      const float pi = i ? iq[2 * (i - 1) + 1] : (prev ? prev[1] : im);
      const float t_im = pr * im - pi * re;
      const float t_re = pr * re + pi * im;
      if (binary_fsk) {
        state = (int8_t)((t_im > 0.0f) ||
                         (t_im == 0.0f && !std::signbit(t_im) &&
                          std::signbit(t_re)));
      } else {
        const float val = std::atan2(t_im, t_re);
        int s = 0;
        for (int k = 0; k < n_thr; ++k) s += val > thresholds[k];
        state = (int8_t)s;
      }
    }
    states[i] = state;
  }
  if (prev == nullptr) states[0] = -1;
  *peak_out = peak;
}

// Run-length encode an int8 state vector: writes up to cap runs into
// (run_states, run_lens) and returns the true number of runs (callers
// re-invoke with a larger cap if it exceeds cap; cap = n always fits).
// Sequential single pass — the streaming host path's per-chunk RLE.
extern "C" int64_t urh_rle_i8(const int8_t* states, int64_t n,
                              int64_t cap, int8_t* run_states,
                              int64_t* run_lens) {
  if (n <= 0) return 0;
  int64_t m = 0;
  int8_t cur = states[0];
  int64_t len = 1;
  for (int64_t i = 1; i < n; ++i) {
    if (states[i] == cur) {
      ++len;
    } else {
      if (m < cap) { run_states[m] = cur; run_lens[m] = len; }
      ++m;
      cur = states[i];
      len = 1;
    }
  }
  if (m < cap) { run_states[m] = cur; run_lens[m] = len; }
  return m + 1;
}

// Sliding full-window median via an incremental sorted window: remove
// the outgoing element (binary search + shift) and insert the incoming
// one per step — ~20 cheap inline ops/window for small k instead of a
// std::copy + nth_element libcall pair.  Semantics identical to
// urh_median_full_windows (out[b, i] = sorted(rows[b, i:i+k])[k/2]).
extern "C" void urh_median_sliding(const double* rows, int64_t b, int64_t n,
                                   int64_t k, float* out) {
  const int64_t full = n - k + 1;
  if (full <= 0 || k <= 0) return;
#pragma omp parallel
  {
    double* win = new double[k];
#pragma omp for schedule(static)
    for (int64_t row = 0; row < b; ++row) {
      const double* src = rows + row * n;
      float* dst = out + row * full;
      bool has_nan = false;
      for (int64_t i = 0; i < n; ++i) has_nan |= std::isnan(src[i]);
      if (has_nan) {
        // NaN breaks the sorted-window invariants (lower_bound is
        // undefined on unordered data); per-window nth_element keeps
        // the damage confined to windows that contain the NaN
        for (int64_t i = 0; i < full; ++i) {
          std::copy(src + i, src + i + k, win);
          std::nth_element(win, win + k / 2, win + k);
          dst[i] = (float)win[k / 2];
        }
        continue;
      }
      std::copy(src, src + k, win);
      std::sort(win, win + k);
      dst[0] = (float)win[k / 2];
      for (int64_t i = 1; i < full; ++i) {
        const double outgoing = src[i - 1];
        const double incoming = src[i + k - 1];
        // remove outgoing
        double* pos = std::lower_bound(win, win + k, outgoing);
        // (outgoing is always present; lower_bound finds its first slot)
        std::move(pos + 1, win + k, pos);
        // insert incoming into the k-1 sorted prefix
        double* ins = std::lower_bound(win, win + k - 1, incoming);
        std::move_backward(ins, win + k - 1, win + k);
        *ins = incoming;
        dst[i] = (float)win[k / 2];
      }
    }
    delete[] win;
  }
}
