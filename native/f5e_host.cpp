// f5e_host: native host-side runtime for the TTS serving/data path.
//
// The reference's host-side hot paths run through external native code
// (torchaudio resampler, TRT engine IO, numba MAS); here the equivalents the
// Python layer actually hits per-request are implemented in C++ and bound via
// ctypes (no pybind11 in this environment):
//   - polyphase windowed-sinc resampler (replaces scipy.resample_poly on the
//     request path)
//   - equal-step linear cross-fade stitcher (utils_infer.py:520-556 math)
//   - frame-packed batch builder (dataset.py:250-281 packing, O(n log n))
//   - pcm16 <-> float conversions for the socket server
//
// Build: make -C native    (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// pcm conversions
// ---------------------------------------------------------------------------

void pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
}

void f32_to_pcm16(const float* in, int16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
    out[i] = (int16_t)lrintf(v * 32767.0f);
  }
}

// ---------------------------------------------------------------------------
// polyphase windowed-sinc resampler (kaiser-windowed, zero-phase)
// in: n_in samples at rate sr_in -> out at rate sr_out (gcd-reduced up/down).
// out must hold ceil(n_in * up / down) samples. Returns output length.
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

int64_t resample_poly_f32(const float* in, int64_t n_in, int64_t up, int64_t down,
                          float* out) {
  if (up == down) {
    std::memcpy(out, in, n_in * sizeof(float));
    return n_in;
  }
  // anti-alias cutoff at min(up, down), half-width 10 taps per phase
  const int half_len = 10 * (int)std::max(up, down);
  const double f_c = 0.5 / (double)std::max(up, down);  // normalized (rate*up)
  const double beta = 8.555;                             // ~80 dB kaiser
  const int64_t n_taps = 2 * half_len + 1;
  std::vector<double> h(n_taps);
  const double i0b = bessel_i0(beta);
  for (int64_t i = 0; i < n_taps; ++i) {
    const double t = (double)(i - half_len);
    const double sinc = (t == 0.0) ? 2.0 * f_c : std::sin(2.0 * M_PI * f_c * t) / (M_PI * t);
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - (t / half_len) * (t / half_len)))) / i0b;
    h[i] = (double)up * sinc * w;
  }
  const int64_t n_out = (n_in * up + down - 1) / down;
  for (int64_t m = 0; m < n_out; ++m) {
    // output sample m sits at position m*down in the upsampled stream
    const int64_t pos = m * down;
    double acc = 0.0;
    // upsampled index j contributes in[j/up] when j%up==0
    const int64_t j_lo = pos - half_len;
    const int64_t j_hi = pos + half_len;
    int64_t j = j_lo;
    const int64_t rem = ((j % up) + up) % up;
    if (rem != 0) j += up - rem;  // first multiple of `up` >= j_lo
    for (; j <= j_hi; j += up) {
      const int64_t n = j / up;
      if (n < 0 || n >= n_in) continue;
      acc += h[j - j_lo] * in[n];
    }
    out[m] = (float)acc;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// cross-fade stitch: concatenate k waves with linear cross-fades.
// waves: flat buffer; lens[k]; fade_samples per joint (clamped per pair).
// out must hold sum(lens). Returns stitched length.
// ---------------------------------------------------------------------------

int64_t crossfade_stitch_f32(const float* waves, const int64_t* lens, int64_t k,
                             int64_t fade_samples, float* out) {
  if (k == 0) return 0;
  int64_t out_len = lens[0];
  std::memcpy(out, waves, lens[0] * sizeof(float));
  const float* cur = waves + lens[0];
  for (int64_t i = 1; i < k; ++i) {
    const int64_t n = lens[i];
    int64_t f = std::min({fade_samples, out_len, n});
    if (f <= 0) {
      std::memcpy(out + out_len, cur, n * sizeof(float));
      out_len += n;
    } else {
      float* tail = out + out_len - f;
      for (int64_t j = 0; j < f; ++j) {
        const float a = (f == 1) ? 1.0f : 1.0f - (float)j / (float)(f - 1);
        const float b = 1.0f - a;
        tail[j] = tail[j] * a + cur[j] * b;
      }
      std::memcpy(out + out_len, cur + f, (n - f) * sizeof(float));
      out_len += n - f;
    }
    cur += n;
  }
  return out_len;
}

// ---------------------------------------------------------------------------
// frame packing: sort indices by length, pack batches under a frame budget.
// Mirrors DynamicBatchSampler (dataset.py:250-281). Outputs:
//   batch_of[i]  = batch id for item i (-1 if dropped)
// Returns number of batches.
// ---------------------------------------------------------------------------

int64_t pack_batches_i32(const int32_t* frame_lens, int64_t n,
                         int32_t frames_threshold, int32_t max_samples,
                         int32_t min_frames, int32_t max_frames,
                         int32_t* batch_of) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return frame_lens[a] < frame_lens[b];
  });
  for (int64_t i = 0; i < n; ++i) batch_of[i] = -1;

  int32_t batch_frames = 0;
  int32_t batch_count = 0;
  int64_t batch_id = 0;
  bool open = false;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t idx = order[oi];
    const int32_t fl = frame_lens[idx];
    if (fl < min_frames || fl > max_frames) continue;
    if (open && batch_frames + fl <= frames_threshold &&
        (max_samples == 0 || batch_count < max_samples)) {
      batch_of[idx] = (int32_t)batch_id;
      batch_frames += fl;
      ++batch_count;
    } else {
      if (open) ++batch_id;
      if (fl <= frames_threshold) {
        batch_of[idx] = (int32_t)batch_id;
        batch_frames = fl;
        batch_count = 1;
        open = true;
      } else {
        batch_frames = 0;
        batch_count = 0;
        open = false;
      }
    }
  }
  return open ? batch_id + 1 : batch_id;
}

}  // extern "C"
