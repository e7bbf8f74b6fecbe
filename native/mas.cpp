// Batched width-1 Monotonic Alignment Search — native host kernel.
//
// TPU-native counterpart of the reference's only native component
// (Grad-TTS_TF/model/monotonic_align/core.pyx: Cython + OpenMP prange).
// The device path is ops/mas.py (lax.scan DP on TPU); this C++ kernel is
// the host-side equivalent used by offline tooling (forced alignment export,
// dataset preparation, CPU-only environments) and as an independent oracle
// for the device kernel's tests.
//
// Layout: log_attn is [B, T_mel, T_text] row-major float32. For each batch
// element b only the [out_lens[b], in_lens[b]] top-left rectangle is read;
// the one-hot path is written into `path` (same shape, pre-zeroed by the
// caller or here).
//
// Build: make -C native   (produces libmas.so; see native/Makefile)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

// Single-sample width-1 Viterbi: forward max accumulation + backtrack.
void mas_single(const float* log_attn, float* path, int64_t t_mel,
                int64_t t_text, int64_t stride_mel) {
  if (t_mel <= 0 || t_text <= 0) return;

  // log_p[i][j] = log_attn[i][j] + max(log_p[i-1][j-1], log_p[i-1][j])
  std::vector<float> prev(t_text, kNegInf), cur(t_text);
  std::vector<uint8_t> choose(static_cast<size_t>(t_mel) * t_text, 0);

  prev[0] = log_attn[0];  // row 0: only j == 0 reachable
  for (int64_t i = 1; i < t_mel; ++i) {
    const float* row = log_attn + i * stride_mel;
    uint8_t* ch = choose.data() + i * t_text;
    float diag = kNegInf;  // log_p[i-1][j-1]
    for (int64_t j = 0; j < t_text; ++j) {
      const float up = prev[j];
      const bool take_diag = diag >= up;
      ch[j] = take_diag;
      cur[j] = row[j] + (take_diag ? diag : up);
      diag = up;
    }
    std::swap(prev, cur);
  }

  // Backtrack from (t_mel-1, t_text-1).
  int64_t j = t_text - 1;
  for (int64_t i = t_mel - 1; i > 0; --i) {
    path[i * stride_mel + j] = 1.0f;
    if (j > 0 && choose[i * t_text + j]) --j;
  }
  path[j] = 1.0f;
}

}  // namespace

extern "C" {

// b_mas(log_attn [B, T_mel, T_text], path (out, pre-zeroed not required),
//       in_lens [B], out_lens [B])
void mas_batch(const float* log_attn, float* path, const int32_t* in_lens,
               const int32_t* out_lens, int64_t batch, int64_t t_mel,
               int64_t t_text) {
  const int64_t plane = t_mel * t_text;
  std::memset(path, 0, sizeof(float) * batch * plane);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t om = std::min<int64_t>(out_lens[b], t_mel);
    const int64_t im = std::min<int64_t>(in_lens[b], t_text);
    mas_single(log_attn + b * plane, path + b * plane, om, im, t_text);
  }
}

int mas_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
