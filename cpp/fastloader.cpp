// Native data-loader kernels for wavenet_tpu (C++17, no external deps).
//
// The reference's data path is pure-Python NumPy (SURVEY.md §2 #2); at pod
// scale the host input pipeline becomes the bottleneck long before the TPU
// does, so the hot host-side ops live here:
//   * mulaw_encode: float waveform -> int32 mu-law class ids
//   * mulaw_decode: int32 ids -> float waveform
//   * gather_windows: batched strided window gather out of encoded clips
//     (the per-step crop batch assembly), multi-threaded
//
// Built as a plain shared library; bound from Python with ctypes
// (wavenet_tpu/cpp/loader.py).  Exact same rounding semantics as
// audio/mulaw.py (round-half-even like NumPy) — asserted bit-identical in
// tests/test_cpp_loader.py.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// y = round_half_even((sign(x)*log1p(mu|x|)/log1p(mu) + 1)/2 * mu)
void mulaw_encode(const float* x, int64_t n, int32_t q_channels,
                  int32_t* out) {
  const double mu = q_channels - 1;
  const double denom = std::log1p(mu);
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    if (v > 1.0) v = 1.0;
    if (v < -1.0) v = -1.0;
    double c = (v >= 0 ? 1.0 : -1.0) * std::log1p(mu * std::fabs(v)) / denom;
    double scaled = (c + 1.0) / 2.0 * mu;
    // round-half-even to match numpy.round
    double r = std::nearbyint(scaled);  // uses current rounding mode
    out[i] = static_cast<int32_t>(r);
  }
}

void mulaw_decode(const int32_t* q, int64_t n, int32_t q_channels,
                  float* out) {
  const double mu = q_channels - 1;
  const double lg = std::log1p(mu);
  for (int64_t i = 0; i < n; ++i) {
    double c = 2.0 * q[i] / mu - 1.0;
    double v = (c >= 0 ? 1.0 : -1.0) * std::expm1(std::fabs(c) * lg) / mu;
    out[i] = static_cast<float>(v);
  }
}

// Gather B windows of length W: out[b, :] = clips[clip_idx[b]][start[b] : +W]
// clip_ptrs: array of B pointers? Simpler: flat concatenated clip buffer with
// per-clip offsets; callers pass (flat, clip_offsets) once.
void gather_windows(const int32_t* flat, const int64_t* clip_offsets,
                    const int32_t* clip_idx, const int64_t* starts,
                    int64_t batch, int64_t window, int32_t* out,
                    int32_t num_threads) {
  auto work = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const int32_t* src = flat + clip_offsets[clip_idx[b]] + starts[b];
      int32_t* dst = out + b * window;
      for (int64_t i = 0; i < window; ++i) dst[i] = src[i];
    }
  };
  if (num_threads <= 1 || batch < 4) {
    work(0, batch);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (batch + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t b0 = t * per, b1 = std::min(batch, b0 + per);
    if (b0 >= b1) break;
    ts.emplace_back(work, b0, b1);
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
