// Native build of the reference's Cython kernel layer, for BASELINE
// MEASUREMENT ONLY (this code is not part of urh_tpu).
//
// VERDICT r3 #4 asks for reference-true perf baselines for awre and
// auto-interpretation: numbers traceable to awre_util.pyx /
// auto_interpretation.pyx execution.  Cython is not installed in this
// image and cannot be fetched (zero egress), so the .pyx files cannot
// be compiled as-is.  This file provides the same kernels as plain C++
// (same algorithms, same loop structure, same threading: OpenMP only
// where the .pyx uses prange), compiled at -O3, and exposed to the
// reference's OWN Python code (AutoInterpretation.py, awre engines)
// through ctypes shims registered as urh.cythonext.* modules.  g++ -O3
// on these loops is at least as fast as Cython's generated C++, so the
// measured baseline is an upper bound on the reference's real speed —
// i.e. conservative for any vs_reference ratio we report.
//
// Sources mirrored (cited per function):
//   /root/reference/src/urh/cythonext/signal_functions.pyx:245-378
//   /root/reference/src/urh/cythonext/auto_interpretation.pyx:55-240
//   /root/reference/src/urh/cythonext/util.pyx:50-304
//   /root/reference/src/urh/cythonext/awre_util.pyx:15-369

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// signal_functions.pyx
// ---------------------------------------------------------------------------

static inline float clampf(float x) {  // signal_functions.pyx:245-250
  if (x < -1.0f) return -1.0f;
  if (x > 1.0f) return 1.0f;
  return x;
}

// costa_demod, float32 input (signal_functions.pyx:252-330)
static void costa_demod_f32(const float* iq, long long ns, float noise_sqrd,
                            int loop_order, float bandwidth, float* out) {
  const float damping = std::sqrt(2.0f) / 2.0f;
  const float denom = 1.0f + 2.0f * damping * bandwidth + bandwidth * bandwidth;
  const float alpha = (4.0f * damping * bandwidth) / denom;
  const float beta = (4.0f * bandwidth * bandwidth) / denom;
  float costa_freq = 0.0f, costa_error = 0.0f, costa_phase = 1.5f;
  if (loop_order > 4) loop_order = 4;
  if (ns > 0) out[0] = 0.0f;
  for (long long i = 1; i < ns; ++i) {
    const float real = iq[2 * i], imag = iq[2 * i + 1];
    if (real * real + imag * imag <= noise_sqrd) {
      out[i] = -4.0f;  // NOISE_FSK_PSK, signal_functions.pyx:31-44
      continue;
    }
    const float nco_re = std::cos(-costa_phase), nco_im = std::sin(-costa_phase);
    const float pr = nco_re * real - nco_im * imag;
    const float pi = nco_re * imag + nco_im * real;
    if (loop_order == 2) {
      costa_error = pi * pr;
    } else {
      const float f1 = pr > 0.0f ? 1.0f : -1.0f;
      const float f2 = pi > 0.0f ? 1.0f : -1.0f;
      costa_error = f1 * pi - f2 * pr;
    }
    costa_error = clampf(costa_error);
    costa_freq += beta * costa_error;
    costa_phase += costa_freq + alpha * costa_error;
    while (costa_phase > 2.0f * (float)M_PI) costa_phase -= 2.0f * (float)M_PI;
    while (costa_phase < -2.0f * (float)M_PI) costa_phase += 2.0f * (float)M_PI;
    costa_freq = clampf(costa_freq);
    out[i] = (loop_order == 2) ? pr : 2.0f * pr + pi;
  }
}

// afp_demod, float32 input (signal_functions.pyx:333-378).
// mod: 0=ASK, 1=FSK, 2=PSK.  prange -> omp parallel for (pyx:363).
void ref_afp_demod(const float* iq, long long ns, float noise_mag, int mod,
                   int mod_order, float costas_bw, float* out) {
  if (ns <= 2) {
    for (long long i = 0; i < ns; ++i) out[i] = 0.0f;
    return;
  }
  const float noise_sqrd = noise_mag * noise_mag;
  const float max_magnitude = std::sqrt(2.0f);  // float32 table, pyx:351-352
  if (mod == 2) {
    costa_demod_f32(iq, ns, noise_sqrd, mod_order, costas_bw, out);
    return;
  }
  const float NOISE = (mod == 0) ? 0.0f : -4.0f;  // pyx:31-44
  out[0] = NOISE;
#pragma omp parallel for schedule(static)
  for (long long i = 1; i < ns; ++i) {
    const float real = iq[2 * i], imag = iq[2 * i + 1];
    const float magnitude = real * real + imag * imag;
    if (magnitude <= noise_sqrd) {
      out[i] = NOISE;
      continue;
    }
    if (mod == 0) {
      out[i] = std::sqrt(magnitude) / max_magnitude;
    } else {
      const float pr = iq[2 * (i - 1)], pi = iq[2 * (i - 1) + 1];
      out[i] = std::atan2(pr * imag - pi * real, pr * real + pi * imag);
    }
  }
}

// __modulate, float32 output, ASK/FSK/PSK (signal_functions.pyx:81-177;
// GFSK/OQPSK are not exercised by the measured workloads).
// mod: 0=ASK, 1=FSK, 2=PSK.  out is (total_symbols*sps+pause, 2) zeroed.
uint64_t ref_bit_array_to_number(const uint8_t* bits, int64_t end,
                                 int64_t start);  // defined below

void ref_modulate(const uint8_t* bits, int64_t num_bits, uint32_t sps,
                  int mod, const float* parameters, uint16_t bps,
                  float carrier_amplitude, float carrier_frequency,
                  float carrier_phase, float sample_rate, uint32_t start,
                  float* out) {
  const int64_t total_symbols = num_bits / bps;
  if (total_symbols == 0) return;

  std::vector<float> phase_corrections;
  if (mod == 1) {
    phase_corrections.assign(total_symbols, 0.0f);
    for (int64_t s = 1; s < total_symbols; ++s) {
      const uint64_t index = ref_bit_array_to_number(bits, (s + 1) * bps, s * bps);
      const uint64_t prev = ref_bit_array_to_number(bits, s * bps, (s - 1) * bps);
      const float f = parameters[index], f_prev = parameters[prev];
      if (f != f_prev) {
        const float t = (float)(s * (int64_t)sps + start - 1) / sample_rate;
        phase_corrections[s] = std::fmod(
            phase_corrections[s - 1] + 2.0f * (float)M_PI * (f_prev - f) * t,
            2.0f * (float)M_PI);
      } else {
        phase_corrections[s] = phase_corrections[s - 1];
      }
    }
  }

#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < total_symbols; ++s) {
    const uint64_t index = ref_bit_array_to_number(bits, (s + 1) * bps, s * bps);
    float a = carrier_amplitude, f = carrier_frequency, phi = carrier_phase;
    float phase_correction = 0.0f;
    if (mod == 0) {
      a = parameters[index];
      if (a == 0.0f) continue;
    } else if (mod == 1) {
      f = parameters[index];
      phase_correction = phase_corrections[s];
    } else {
      phi = parameters[index];
    }
    for (int64_t i = s * (int64_t)sps; i < (s + 1) * (int64_t)sps; ++i) {
      const float t = (float)(i + start) / sample_rate;
      const float arg = 2.0f * (float)M_PI * f * t + phi + phase_correction;
      out[2 * i] = a * std::cos(arg);
      out[2 * i + 1] = a * std::sin(arg);
    }
  }
}

// grab_pulse_lens (signal_functions.pyx:392-495): run-length symbol
// state machine with glitch tolerance, pause detection and the ASK
// short-pause aggregation rule.  thresholds passed in; out is
// (num_samples, 2) int64 (caller truncates to the returned count).
int64_t ref_grab_pulse_lens(const float* samples, int64_t num_samples,
                            float noise_sentinel, uint16_t tolerance,
                            int is_ask, uint32_t samples_per_symbol,
                            int modulation_order, const float* thresholds,
                            int64_t* out) {
  if (num_samples == 0) return 0;
  const int PAUSE = -1;
  std::vector<int64_t> state_count(modulation_order, 0);
  int64_t pulse_length = 0, cur_index = 0, consecutive_pause = 0;
  int cur_state, tmp_state, new_state;

  const float s_prev = samples[0];
  if (s_prev == noise_sentinel) {
    cur_state = PAUSE;
  } else {
    // faithful quirk: the reference classifies the uninitialized s (0.0)
    // here, not s_prev (signal_functions.pyx:425-429)
    cur_state = modulation_order - 1;
    for (int k = 0; k + 1 < modulation_order; ++k) {
      if (0.0f <= thresholds[k]) { cur_state = k; break; }
    }
  }

  for (int64_t i = 0; i < num_samples; ++i) {
    ++pulse_length;
    const float s = samples[i];
    if (s == noise_sentinel) {
      tmp_state = PAUSE;
    } else {
      tmp_state = modulation_order - 1;
      for (int k = 0; k + 1 < modulation_order; ++k) {
        if (s <= thresholds[k]) { tmp_state = k; break; }
      }
    }
    consecutive_pause = (tmp_state == PAUSE) ? consecutive_pause + 1 : 0;
    for (int j = 0; j < modulation_order; ++j)
      state_count[j] = (j == tmp_state) ? state_count[j] + 1 : 0;
    if (cur_state == tmp_state) continue;

    new_state = -42;
    if (consecutive_pause > tolerance) {
      new_state = PAUSE;
    } else {
      for (int j = 0; j < modulation_order; ++j) {
        if (state_count[j] > tolerance) { new_state = j; break; }
      }
    }
    if (new_state == -42) continue;

    if (is_ask && cur_state == PAUSE
        && (pulse_length - tolerance) < (int64_t)samples_per_symbol) {
      cur_state = 0;  // aggregate short pauses for ASK
    }
    if (cur_index > 0 && out[2 * (cur_index - 1)] == cur_state) {
      out[2 * (cur_index - 1) + 1] += pulse_length - tolerance;
    } else {
      out[2 * cur_index] = cur_state;
      out[2 * cur_index + 1] = pulse_length - tolerance;
      ++cur_index;
    }
    pulse_length = tolerance;
    cur_state = new_state;
  }

  if (cur_index < num_samples) {
    if (cur_index > 0 && out[2 * (cur_index - 1)] == cur_state) {
      out[2 * (cur_index - 1) + 1] += pulse_length - tolerance;
    } else {
      out[2 * cur_index] = cur_state;
      out[2 * cur_index + 1] = pulse_length - tolerance;
      ++cur_index;
    }
  }
  return cur_index;
}

// fir_filter (signal_functions.pyx:513-525): the reference's direct
// O(N*M) complex convolution (its FFT path lives in Python).
void ref_fir_filter(const float* input, int64_t n, const float* taps,
                    int64_t m, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    float acc_re = 0.0f, acc_im = 0.0f;
    const int64_t kmax = std::min(m, i + 1);
    for (int64_t k = 0; k < kmax; ++k) {
      const float xr = input[2 * (i - k)], xi = input[2 * (i - k) + 1];
      const float tr = taps[2 * k], ti = taps[2 * k + 1];
      acc_re += xr * tr - xi * ti;
      acc_im += xr * ti + xi * tr;
    }
    out[2 * i] = acc_re;
    out[2 * i + 1] = acc_im;
  }
}

// ---------------------------------------------------------------------------
// auto_interpretation.pyx
// ---------------------------------------------------------------------------

// segment_messages_from_magnitudes (auto_interpretation.pyx:55-111).
// Writes (start, end) pairs; returns pair count (capacity >= n/20+2).
// double input: IQArray.magnitudes is float64 in the reference.
long long ref_segment_messages(const double* magnitudes, long long n,
                               double noise_threshold, long long* out_pairs) {
  if (n == 0) return 0;
  long long count = 0, start = 0;
  const unsigned outlier_tolerance = 10;
  unsigned conseq_above = 0, conseq_below = 0;
  int state = magnitudes[0] > noise_threshold ? 1 : -1;
  for (long long i = 0; i < n; ++i) {
    const bool is_above = magnitudes[i] > noise_threshold;
    if (state == 1) {
      if (is_above) conseq_below = 0; else ++conseq_below;
    } else {
      if (is_above) ++conseq_above; else conseq_above = 0;
    }
    if (state == 1 && conseq_below >= outlier_tolerance) {
      state = -1;
      out_pairs[2 * count] = start;
      out_pairs[2 * count + 1] = i - conseq_below;
      ++count;
      conseq_below = conseq_above = 0;
    } else if (state == -1 && conseq_above >= outlier_tolerance) {
      state = 1;
      start = i - conseq_above;
      conseq_below = conseq_above = 0;
    }
  }
  if (state == 1 && start < n - (long long)conseq_below) {
    out_pairs[2 * count] = start;
    out_pairs[2 * count + 1] = n - conseq_below;
    ++count;
  }
  return count;
}

// get_threshold_divisor_histogram (auto_interpretation.pyx:113-143).
// hist has capacity max(plateau_lengths)+1, zero-initialised by caller.
void ref_divisor_histogram(const uint64_t* pl, long long n, double threshold,
                           uint64_t* hist) {
  for (long long i = 0; i < n; ++i) {
    for (long long j = i + 1; j < n; ++j) {
      uint64_t x = pl[i], y = pl[j];
      if (x == 0 || y == 0) continue;
      const uint64_t mn = x < y ? x : y, mx = x < y ? y : x;
      if ((double)mx / (double)mn - (double)(mx / mn) < threshold) ++hist[mn];
    }
  }
}

// merge_plateaus (auto_interpretation.pyx:145-176), faithful control flow
// including the in-place overwrite of result[current] on merge.
long long ref_merge_plateaus(const uint64_t* plateaus, long long L,
                             uint64_t tolerance, uint64_t max_count,
                             uint64_t* result) {
  if (L == 0) return 0;
  long long current = 0, i = 1;
  result[0] = plateaus[0] <= tolerance ? 0 : plateaus[0];
  while (i < L && (uint64_t)current < max_count) {
    if (plateaus[i] <= tolerance) {
      long long n = 2;
      while (i + n < L && plateaus[i + n] <= tolerance) n += 2;
      uint64_t tmp_sum = 0;
      for (long long j = i - 1; j < std::min(L, i + n); ++j) tmp_sum += plateaus[j];
      result[current] = tmp_sum;
      i += n;
    } else {
      ++current;
      result[current] = plateaus[i];
      ++i;
    }
  }
  return current + 1;
}

// get_plateau_lengths (auto_interpretation.pyx:179-208)
long long ref_plateau_lengths(const float* rect, long long n, float center,
                              int percentage, uint64_t* out) {
  if (n == 0) return 0;
  int state = rect[0] <= center ? -1 : 1;
  uint64_t plateau_length = 0, current_sum = 0;
  long long count = 0;
  for (long long i = 0; i < n; ++i) {
    if (current_sum >= (uint64_t)(percentage * n / 100)) break;
    const int new_state = rect[i] <= center ? -1 : 1;
    if (state == new_state) {
      ++plateau_length;
    } else {
      out[count++] = plateau_length;
      current_sum += plateau_length;
      state = new_state;
      plateau_length = 1;
    }
  }
  return count;
}

// median_filter (auto_interpretation.pyx:211-240).  The reference passes
// start=i (the windows trail the sample, truncated at the end) — kept
// faithfully.  prange -> omp parallel for.
void ref_median_filter(const double* data, long long n, unsigned k,
                       float* out) {
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < n; ++i) {
    unsigned kk = k;
    if (i + (long long)kk > n) kk = (unsigned)(n - i);
    float buf[64];
    std::vector<float> heap_buf;
    float* b = buf;
    if (kk > 64) { heap_buf.resize(kk); b = heap_buf.data(); }
    for (unsigned j = 0; j < kk; ++j) b[j] = (float)data[i + j];
    std::sort(b, b + kk);
    out[i] = b[kk / 2];
  }
}

// ---------------------------------------------------------------------------
// util.pyx — CRC family
// ---------------------------------------------------------------------------

// arr_to_number (util.pyx:63-73)
uint64_t ref_arr_to_number(const uint8_t* inpt, unsigned len, int reverse,
                           unsigned start) {
  uint64_t result = 0;
  for (unsigned i = start; i < len; ++i) {
    if (!reverse) {
      if (inpt[len - 1 - i + start]) result |= 1ULL << (i - start);
    } else {
      if (inpt[i]) result |= 1ULL << (i - start);
    }
  }
  return result;
}

// bit_array_to_number (util.pyx:50-61)
uint64_t ref_bit_array_to_number(const uint8_t* bits, int64_t end,
                                 int64_t start) {
  if (end < 1) return 0;
  uint64_t acc = 1, result = 0;
  for (int64_t i = start; i < end; ++i) {
    result += bits[end - 1 - i + start] * acc;
    acc *= 2;
  }
  return result;
}

static uint64_t reverse_bits(uint64_t v, unsigned poly_order) {
  uint64_t temp = 0;
  for (unsigned i = 0; i + 1 < poly_order; ++i)
    if (v & (1ULL << i)) temp |= 1ULL << (poly_order - 2 - i);
  return temp;
}

static uint64_t little_endianize(uint64_t v, unsigned order_m1) {
  if (order_m1 == 16)
    return ((v << 8) & 0xFF00ULL) | (v >> 8);
  if (order_m1 == 32)
    return ((v << 24) & 0xFF000000ULL) | ((v << 8) & 0x00FF0000ULL) |
           ((v >> 8) & 0x0000FF00ULL) | (v >> 24);
  if (order_m1 == 64)
    return ((v << 56) & 0xFF00000000000000ULL) | (v >> 56) |
           ((v >> 40) & 0x000000000000FF00ULL) | ((v << 40) & 0x00FF000000000000ULL) |
           ((v << 24) & 0x0000FF0000000000ULL) | ((v >> 24) & 0x0000000000FF0000ULL) |
           ((v << 8) & 0x000000FF00000000ULL) | ((v >> 8) & 0x00000000FF000000ULL);
  return v;
}

// crc (util.pyx:75-125)
uint64_t ref_crc(const uint8_t* inpt, unsigned len_inpt, const uint8_t* poly,
                 unsigned poly_order, const uint8_t* start_value,
                 const uint8_t* final_xor, int lsb_first,
                 int reverse_polynomial, int reverse_all, int little_endian) {
  const uint64_t crc_mask = (uint64_t)std::pow(2.0, (double)(poly_order - 1)) - 1;
  const uint64_t poly_mask = (crc_mask + 1) >> 1;
  const uint64_t poly_int =
      ref_arr_to_number(poly, poly_order, reverse_polynomial, 1) & crc_mask;
  uint64_t crc = ref_arr_to_number(start_value, poly_order - 1, 0, 0) & crc_mask;
  for (unsigned i = 0; i < len_inpt + 7; i += 8) {
    for (unsigned j = 0; j < 8; ++j) {
      const unsigned idx = lsb_first ? i + (7 - j) : i + j;
      if (idx >= len_inpt) break;
      if (((crc & poly_mask) > 0) != (bool)inpt[idx]) {
        crc = (crc << 1) & crc_mask;
        crc ^= poly_int;
      } else {
        crc = (crc << 1) & crc_mask;
      }
    }
  }
  crc ^= ref_arr_to_number(final_xor, poly_order - 1, 0, 0) & crc_mask;
  if (reverse_all) crc = reverse_bits(crc, poly_order) & crc_mask;
  if (little_endian) crc = little_endianize(crc, poly_order - 1);
  return crc & crc_mask;
}

// calculate_cache (util.pyx:138-155)
void ref_calculate_cache(const uint8_t* poly, unsigned poly_order,
                         int reverse_polynomial, unsigned bits,
                         uint64_t* cache /* size 2^bits */) {
  const uint64_t crc_mask = (uint64_t)std::pow(2.0, (double)(poly_order - 1)) - 1;
  const uint64_t poly_mask = (crc_mask + 1) >> 1;
  const uint64_t poly_int =
      ref_arr_to_number(poly, poly_order, reverse_polynomial, 1) & crc_mask;
  const uint64_t n = 1ULL << bits;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t crcv = i << (poly_order - 1 - bits);
    for (unsigned b = 0; b < bits; ++b) {
      if (crcv & poly_mask) {
        crcv = (crcv << 1) & crc_mask;
        crcv ^= poly_int;
      } else {
        crcv = (crcv << 1) & crc_mask;
      }
    }
    cache[i] = crcv;
  }
}

// cached_crc (util.pyx:157-214).  Mutates start_value for the tail path
// exactly like the reference does.
uint64_t ref_cached_crc(const uint64_t* cache, unsigned bits,
                        const uint8_t* inpt, unsigned len_inpt,
                        const uint8_t* poly, unsigned poly_order,
                        uint8_t* start_value, const uint8_t* final_xor,
                        int lsb_first, int reverse_polynomial, int reverse_all,
                        int little_endian) {
  if (len_inpt < bits)
    return ref_crc(inpt, len_inpt, poly, poly_order, start_value, final_xor,
                   lsb_first, reverse_polynomial, reverse_all, little_endian);
  const uint64_t crc_mask = (uint64_t)std::pow(2.0, (double)(poly_order - 1)) - 1;
  uint64_t crcv = ref_arr_to_number(start_value, poly_order - 1, 0, 0) & crc_mask;
  unsigned i = 0;
  for (; i + bits <= len_inpt; i += bits) {
    uint64_t data = 0;
    if (lsb_first) {
      for (unsigned j = 0; j < bits; ++j)
        if (inpt[i + j]) data |= 1ULL << j;
    } else {
      for (unsigned j = 0; j < bits; ++j)
        if (inpt[i + bits - 1 - j]) data |= 1ULL << j;
    }
    const uint64_t pos = (crcv >> (poly_order - bits - 1)) ^ data;
    crcv = ((crcv << bits) ^ cache[pos]) & crc_mask;
  }
  if (len_inpt % bits > 0) {
    const unsigned sv_len = poly_order - 1;
    for (unsigned b = 0; b < sv_len; ++b)
      start_value[sv_len - 1 - b] = (crcv & (1ULL << b)) ? 1 : 0;
    const unsigned rest = len_inpt % bits;
    crcv = ref_crc(inpt + (len_inpt - rest), rest, poly, poly_order,
                   start_value, final_xor, lsb_first, reverse_polynomial,
                   reverse_all, little_endian);
  } else {
    crcv ^= ref_arr_to_number(final_xor, poly_order - 1, 0, 0) & crc_mask;
    if (reverse_all) crcv = reverse_bits(crcv, poly_order) & crc_mask;
    if (little_endian) crcv = little_endianize(crcv, poly_order - 1);
  }
  return crcv & crc_mask;
}

// get_crc_datarange (util.pyx:216-304); returns (start, end) via out[2].
// The reference's reverse_all branch writes steps[j] (not steps[i]) —
// kept as-is for behavioral parity.
void ref_get_crc_datarange(const uint8_t* inpt, unsigned len_inpt,
                           const uint8_t* poly, unsigned poly_order,
                           uint64_t vrfy_crc_start, const uint8_t* start_value,
                           const uint8_t* final_xor, int lsb_first,
                           int reverse_polynomial, int reverse_all,
                           int little_endian, uint64_t* out) {
  out[0] = out[1] = 0;
  const unsigned len_crc = poly_order - 1;
  if (vrfy_crc_start - 1 + len_crc >= len_inpt || vrfy_crc_start < 2) return;

  std::vector<uint64_t> steps(len_inpt + 2, 0);
  const uint64_t crc_mask = (uint64_t)std::pow(2.0, (double)(poly_order - 1)) - 1;
  const uint64_t poly_mask = (crc_mask + 1) >> 1;
  const uint64_t poly_int =
      ref_arr_to_number(poly, poly_order, reverse_polynomial, 1) & crc_mask;
  const uint64_t final_xor_int =
      ref_arr_to_number(final_xor, poly_order - 1, 0, 0) & crc_mask;
  const uint64_t vrfy_crc_int =
      ref_arr_to_number(inpt + vrfy_crc_start, len_crc, 0, 0) & crc_mask;
  uint64_t crcvalue = ref_arr_to_number(start_value, poly_order - 1, 0, 0) & crc_mask;
  const unsigned data_end = (unsigned)vrfy_crc_start;
  std::vector<uint8_t> step(len_inpt, 0);
  step[0] = 1;
  for (unsigned i = 0; i < data_end + 7; i += 8) {
    for (unsigned j = 0; j < 8; ++j) {
      const unsigned idx = lsb_first ? i + (7 - j) : i + j;
      if (idx >= data_end) break;
      if (((crcvalue & poly_mask) > 0) != (bool)step[idx]) {
        crcvalue = (crcvalue << 1) & crc_mask;
        crcvalue ^= poly_int;
      } else {
        crcvalue = (crcvalue << 1) & crc_mask;
      }
      steps[idx] = crcvalue ^ final_xor_int;
    }
  }
  if (reverse_all || little_endian) {
    unsigned j = 0;
    for (unsigned i = 0; i < data_end; ++i) {
      if (reverse_all) {
        uint64_t temp = 0;
        for (j = 0; j + 1 < poly_order; ++j)
          if (steps[i] & (1ULL << j)) temp |= 1ULL << (poly_order - 2 - j);
        steps[j] = temp & crc_mask;  // faithful to util.pyx:267
      }
      if (little_endian) steps[i] = little_endianize(steps[i], poly_order - 1);
    }
  }
  crcvalue = ref_crc(inpt, data_end, poly, poly_order, start_value, final_xor,
                     lsb_first, reverse_polynomial, reverse_all, little_endian);
  if (vrfy_crc_int == crcvalue) {
    out[0] = 0;
    out[1] = data_end;
    return;
  }
  bool found = false;
  unsigned i = 0;
  while (i < data_end - 1) {
    unsigned offset = 0;
    while (inpt[i + offset] == 0 && i + offset < data_end - 1) ++offset;
    crcvalue ^= steps[data_end - i - offset - 1];
    if (found) {
      out[0] = i;
      out[1] = data_end;
      return;
    }
    if (vrfy_crc_int == crcvalue) found = true;
    i += 1 + offset;
  }
  out[0] = out[1] = 0;
}

// ---------------------------------------------------------------------------
// awre_util.pyx — ragged bitvector lists passed as (concat buffer, offsets)
// ---------------------------------------------------------------------------

// find_longest_common_sub_sequence_indices (awre_util.pyx:15-44);
// writes up to 10 (start, end) pairs into out, returns count.
long long ref_lcs_indices(const uint8_t* seq1, unsigned len1,
                          const uint8_t* seq2, unsigned len2, uint32_t* out) {
  const unsigned max_results = 10;
  unsigned longest = 0, current_result = 0;
  std::vector<uint32_t> m((size_t)(len1 + 1) * (len2 + 1), 0);
  uint32_t res[max_results][2];
  res[0][0] = res[0][1] = 0;
  for (unsigned i = 0; i < len1; ++i) {
    for (unsigned j = 0; j < len2; ++j) {
      if (seq1[i] == seq2[j]) {
        const unsigned counter = m[(size_t)i * (len2 + 1) + j] + 1;
        m[(size_t)(i + 1) * (len2 + 1) + j + 1] = counter;
        if (counter > longest) {
          longest = counter;
          current_result = 0;
          res[0][0] = i - counter + 1;
          res[0][1] = i + 1;
        } else if (counter == longest && current_result < max_results - 1) {
          ++current_result;
          res[current_result][0] = i - counter + 1;
          res[current_result][1] = i + 1;
        }
      }
    }
  }
  for (unsigned r = 0; r <= current_result; ++r) {
    out[2 * r] = res[r][0];
    out[2 * r + 1] = res[r][1];
  }
  return current_result + 1;
}

// get_difference_matrix (awre_util.pyx:46-68); out is NxN uint32, zeroed.
void ref_difference_matrix(const uint8_t* concat, const int64_t* offsets,
                           uint32_t N, uint32_t* out) {
  for (uint32_t i = 0; i < N; ++i) {
    const uint8_t* bi = concat + offsets[i];
    const uint32_t li = (uint32_t)(offsets[i + 1] - offsets[i]);
    for (uint32_t j = i + 1; j < N; ++j) {
      const uint8_t* bj = concat + offsets[j];
      const uint32_t lj = (uint32_t)(offsets[j + 1] - offsets[j]);
      const uint32_t smaller = li < lj ? li : lj;
      uint32_t k = 0;
      while (k < smaller && bi[k] == bj[k]) ++k;
      out[(size_t)i * N + j] = k;
    }
  }
}

// get_hexvectors (awre_util.pyx:70-90): caller precomputes output offsets
// (ceil(len/4) per vector) and passes the concatenated output buffer.
void ref_hexvectors(const uint8_t* concat, const int64_t* offsets, uint32_t N,
                    uint8_t* out_concat, const int64_t* out_offsets) {
  for (uint32_t i = 0; i < N; ++i) {
    const uint8_t* bv = concat + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    uint8_t* hex = out_concat + out_offsets[i];
    const int64_t M = out_offsets[i + 1] - out_offsets[i];
    for (int64_t j = 0; j < M; ++j) {
      const int64_t end = std::min(len, 4 * j + 4);
      hex[j] = (uint8_t)ref_bit_array_to_number(bv, end, 4 * j);
    }
  }
}

static int64_t find_u8(const uint8_t* data, int64_t len, uint8_t element,
                       int64_t start) {
  for (int64_t i = start; i < len; ++i)
    if (data[i] == element) return i;
  return -1;
}

static int lower_multiple_of_n(int number, int n) {  // awre_util.pyx:93-94
  return n * (int)std::floor((double)number / n);
}

// get_raw_preamble_position (awre_util.pyx:103-167) -> out[3]
void ref_raw_preamble_position(const uint8_t* bitvector, int64_t N,
                               int64_t* out) {
  out[0] = out[1] = out[2] = 0;
  if (N == 0) return;
  int64_t start = -1, lower = 0, upper = 0;
  double k = 0;
  std::vector<uint8_t> pattern;
  while (k < 2 && start < N) {
    ++start;
    const uint8_t a = bitvector[start];
    const uint8_t b = a == 0 ? 1 : 0;
    const int64_t n = find_u8(bitvector, N, b, start) - start;
    if (n <= 0) return;
    const int64_t m = find_u8(bitvector, N, a, start + n) - n - start;
    if (m <= 0) return;
    const int64_t len_pattern = n + m;
    pattern.assign(len_pattern, b);
    for (int64_t j = 0; j < n; ++j) pattern[j] = a;
    int64_t preamble_end = start;
    bool end_reached = false;
    for (int64_t i = start; i < N; i += len_pattern) {
      if (end_reached) break;
      for (int64_t j = 0; j < len_pattern; ++j) {
        // NOTE: the reference reads bitvector[i+j] unguarded past N
        // (memoryview with boundscheck off); clamp to stay defined while
        // producing the same "pattern broken" outcome at the edge
        if (i + j >= N || bitvector[i + j] != pattern[j]) {
          end_reached = true;
          preamble_end = i;
          break;
        }
      }
    }
    upper = start + lower_multiple_of_n((int)(preamble_end + 1 - start),
                                        (int)len_pattern);
    lower = upper - len_pattern;
    k = (double)(upper - start) / (double)len_pattern;
  }
  if (k > 2) {
    out[0] = start;
    out[1] = lower;
    out[2] = upper;
  }
}

// find_possible_sync_words (awre_util.pyx:170-231).  Emits the score map
// as (concatenated words, word lengths, scores); returns entry count.
// out buffers sized by caller: words up to max_word_bytes total.
long long ref_find_possible_sync_words(
    const uint32_t* difference_matrix, const uint32_t* raw_preamble_positions,
    const uint8_t* concat, const int64_t* offsets, uint32_t num_msgs,
    int n_gram_length, uint8_t* out_words, int64_t max_word_bytes,
    int64_t* out_word_lens, double* out_scores, int64_t max_entries) {
  std::map<std::string, double> possible;
  for (uint32_t i = 0; i < num_msgs; ++i) {
    for (uint32_t j = i + 1; j < num_msgs; ++j) {
      const uint32_t sync_end = difference_matrix[(size_t)i * num_msgs + j];
      if (sync_end == 0) continue;
      const uint32_t ij[2] = {i, j};
      for (unsigned k = 0; k < 2; ++k) {
        for (unsigned c = 0; c < 2; ++c) {
          const uint32_t index = ij[c];
          const uint32_t start = raw_preamble_positions[(size_t)index * 3] +
                                 raw_preamble_positions[(size_t)index * 3 + k + 1];
          const int sync_len =
              std::max(0, lower_multiple_of_n((int)sync_end - (int)start,
                                              n_gram_length));
          if (sync_len < 2) continue;
          const uint8_t* bv = concat + offsets[index];
          if (sync_len == 2) {
            if (bv[start] == 0 && bv[start + 1] == 1) continue;
            if (bv[start] == 1 && bv[start + 1] == 0) continue;
          }
          std::string word((const char*)(bv + start), (size_t)sync_len);
          double& score = possible[word];
          score += ((start + sync_len) % n_gram_length == 0) ? 1.0 : 0.5;
        }
      }
    }
  }
  int64_t n_entries = 0, word_pos = 0;
  for (const auto& kv : possible) {
    if (n_entries >= max_entries ||
        word_pos + (int64_t)kv.first.size() > max_word_bytes)
      break;
    std::memcpy(out_words + word_pos, kv.first.data(), kv.first.size());
    out_word_lens[n_entries] = (int64_t)kv.first.size();
    out_scores[n_entries] = kv.second;
    word_pos += (int64_t)kv.first.size();
    ++n_entries;
  }
  return n_entries;
}

// create_difference_histogram (awre_util.pyx:233-263); hist zeroed by
// caller, length = longest active vector.
void ref_create_difference_histogram(const uint8_t* concat,
                                     const int64_t* offsets,
                                     const int64_t* active, int64_t L,
                                     double* hist) {
  const double n = (double)((L * (L - 1)) / 2);
  for (int64_t i = 0; i + 1 < L; ++i) {
    const int64_t ii = active[i];
    const uint8_t* bi = concat + offsets[ii];
    const int64_t li = offsets[ii + 1] - offsets[ii];
    for (int64_t j = i + 1; j < L; ++j) {
      const int64_t jj = active[j];
      const uint8_t* bj = concat + offsets[jj];
      const int64_t lj = offsets[jj + 1] - offsets[jj];
      const int64_t m = li < lj ? li : lj;
      for (int64_t k = 0; k < m; ++k)
        if (bi[k] == bj[k]) hist[k] += 1.0 / n;
    }
  }
}

// find_occurrences (awre_util.pyx:265-301); returns count of start indices
// written to out (capacity len_a).  ignore_indices: linear-scan membership
// like the reference memoryview `in`.
long long ref_find_occurrences(const uint8_t* a, int64_t len_a,
                               const uint8_t* b, int64_t len_b,
                               const uint64_t* ignore, int64_t n_ignore,
                               int return_after_first, int64_t* out) {
  if (len_b > len_a) return 0;
  long long count = 0;
  for (int64_t i = 0; i + len_b <= len_a; ++i) {
    bool found = true;
    for (int64_t j = 0; j < len_b; ++j) {
      if (n_ignore > 0) {
        bool ignored = false;
        for (int64_t g = 0; g < n_ignore; ++g)
          if (ignore[g] == (uint64_t)(i + j)) { ignored = true; break; }
        if (ignored) { found = false; break; }
      }
      if (a[i + j] != b[j]) { found = false; break; }
    }
    if (found) {
      out[count++] = i;
      if (return_after_first) return count;
    }
  }
  return count;
}

// create_seq_number_difference_matrix (awre_util.pyx:303-338);
// out is (N-1) x M int32 pre-filled with -1 by the caller.
void ref_seq_number_difference_matrix(const uint8_t* concat,
                                      const int64_t* offsets, uint32_t N,
                                      int n_gram_length, int64_t M,
                                      int32_t* out) {
  const int32_t n_gram_power_two = (int32_t)std::pow(2.0, (double)n_gram_length);
  for (uint32_t i = 1; i < N; ++i) {
    const uint8_t* bv1 = concat + offsets[i - 1];
    const int64_t len1 = offsets[i] - offsets[i - 1];
    const uint8_t* bv2 = concat + offsets[i];
    const int64_t len2 = offsets[i + 1] - offsets[i];
    const int64_t k = len1 < len2 ? len1 : len2;
    for (int64_t j = 0; j < k; j += n_gram_length) {
      const int64_t index = j / n_gram_length;
      if (index < M) {
        const int32_t diff =
            (int32_t)ref_bit_array_to_number(bv2, std::min(len2, j + n_gram_length), j) -
            (int32_t)ref_bit_array_to_number(bv1, std::min(len1, j + n_gram_length), j);
        out[(size_t)(i - 1) * M + index] =
            ((diff + n_gram_power_two) % n_gram_power_two);
      }
    }
  }
}

// check_crc_for_messages (awre_util.pyx:340-369); writes matching indices
// to out, returns count.
long long ref_check_crc_for_messages(
    const int64_t* message_indices, int64_t n_indices, const uint8_t* concat,
    const int64_t* offsets, uint64_t data_start, uint64_t data_stop,
    uint64_t crc_start, uint64_t crc_stop, const uint8_t* poly,
    unsigned poly_order, const uint8_t* start_value, const uint8_t* final_xor,
    int lsb_first, int reverse_polynomial, int reverse_all, int little_endian,
    int64_t* out) {
  long long count = 0;
  for (int64_t j = 0; j < n_indices; ++j) {
    const int64_t index = message_indices[j];
    const uint8_t* bits = concat + offsets[index];
    const uint64_t check =
        ref_bit_array_to_number(bits + crc_start, (int64_t)(crc_stop - crc_start), 0);
    if (ref_crc(bits + data_start, (unsigned)(data_stop - data_start), poly,
                poly_order, start_value, final_xor, lsb_first,
                reverse_polynomial, reverse_all, little_endian) == check)
      out[count++] = index;
  }
  return count;
}

}  // extern "C"
