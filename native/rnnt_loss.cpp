// CPU reference RNN-Transducer loss — the warp-transducer equivalent
// (reference: HawkAaron/warp-transducer git submodule, consumed as
// warprnnt_pytorch.RNNTLoss at rnnt/models.py:8-11,221).
//
// Forward/backward (alpha/beta) dynamic program over the T×(U+1) lattice in
// log space, with the analytic gradient w.r.t. logits fused into one pass —
// the same contract as warp-transducer's CPU backend (C++/OpenMP), written
// from the Graves 2012 recurrences.  Used from Python via ctypes as the
// numerical cross-check leg of the three-implementation parity ladder
// (SURVEY.md §7 step 3): pure-lax autodiff ↔ THIS ↔ production JAX kernel.
//
// Layout: logits (B, T, U+1, V) float32, labels (B, U) int32, xlen (B,),
// ylen (B,).  Emits per-sample loss (B,) and grad (B, T, U+1, V).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float log_add(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  float m = a > b ? a : b;
  return m + std::log1p(std::exp(-std::fabs(a - b)));
}

// log-softmax over the last axis for one (U1, V) slice at fixed t.
void log_softmax_row(const float* logits, float* out, int v_size) {
  float mx = kNegInf;
  for (int v = 0; v < v_size; ++v) mx = std::max(mx, logits[v]);
  float sum = 0.f;
  for (int v = 0; v < v_size; ++v) sum += std::exp(logits[v] - mx);
  float lse = mx + std::log(sum);
  for (int v = 0; v < v_size; ++v) out[v] = logits[v] - lse;
}

// One sample.  Returns the negative log-likelihood; writes grad w.r.t.
// LOGITS (not log-probs) into grad (T, U+1, V), zero outside valid region.
float rnnt_sample(const float* logits, const int32_t* labels, int t_len,
                  int u_len, int t_max, int u1_max, int v_size, int blank,
                  float* grad) {
  const int U1 = u_len + 1;
  std::vector<float> lp(static_cast<size_t>(t_len) * U1 * v_size);
  for (int t = 0; t < t_len; ++t)
    for (int u = 0; u < U1; ++u)
      log_softmax_row(logits + (static_cast<size_t>(t) * u1_max + u) * v_size,
                      lp.data() + (static_cast<size_t>(t) * U1 + u) * v_size,
                      v_size);

  auto LP = [&](int t, int u, int v) -> float {
    return lp[(static_cast<size_t>(t) * U1 + u) * v_size + v];
  };

  // alpha (t_len+1, U1): alpha[0][0] = 0
  std::vector<float> alpha(static_cast<size_t>(t_len + 1) * U1, kNegInf);
  std::vector<float> beta(static_cast<size_t>(t_len + 1) * U1, kNegInf);
  auto A = [&](int t, int u) -> float& {
    return alpha[static_cast<size_t>(t) * U1 + u];
  };
  auto Bt = [&](int t, int u) -> float& {
    return beta[static_cast<size_t>(t) * U1 + u];
  };

  A(0, 0) = 0.f;
  for (int t = 0; t <= t_len; ++t) {
    for (int u = 0; u <= u_len; ++u) {
      if (t == 0 && u == 0) continue;
      float acc = kNegInf;
      if (t > 0) acc = log_add(acc, A(t - 1, u) + LP(t - 1, u, blank));
      // label transitions are valid only at t < t_len (paths end with the
      // final blank, same convention as the JAX loss / warp-transducer)
      if (u > 0 && t < t_len)
        acc = log_add(acc, A(t, u - 1) + LP(t, u - 1, labels[u - 1]));
      A(t, u) = acc;
    }
  }
  const float logz = A(t_len, u_len);

  Bt(t_len, u_len) = 0.f;
  for (int t = t_len; t >= 0; --t) {
    for (int u = u_len; u >= 0; --u) {
      if (t == t_len && u == u_len) continue;
      float acc = kNegInf;
      if (t < t_len) {
        acc = log_add(acc, Bt(t + 1, u) + LP(t, u, blank));
        if (u < u_len)
          acc = log_add(acc, Bt(t, u + 1) + LP(t, u, labels[u]));
      }
      Bt(t, u) = acc;
    }
  }

  // gradient w.r.t. logits: for each (t, u): softmax(logits) * occ(t,u)
  // − occupancy of the chosen transitions, where occ(t,u) =
  // exp(alpha + beta − logz) summed over outgoing edges == node posterior.
  if (grad) {
    for (int t = 0; t < t_len; ++t) {
      for (int u = 0; u < U1; ++u) {
        float* g =
            grad + (static_cast<size_t>(t) * u1_max + u) * v_size;
        // node posterior mass flowing through (t, u)
        float occ_blank = std::exp(A(t, u) + LP(t, u, blank) +
                                   Bt(t + 1, u) - logz);
        float occ_label = 0.f;
        int lab = -1;
        if (u < u_len) {
          lab = labels[u];
          occ_label = std::exp(A(t, u) + LP(t, u, lab) + Bt(t, u + 1) - logz);
        }
        float node = occ_blank + occ_label;
        for (int v = 0; v < v_size; ++v)
          g[v] = node * std::exp(LP(t, u, v));
        g[blank] -= occ_blank;
        if (lab >= 0) g[lab] -= occ_label;
      }
    }
  }
  return -logz;
}

}  // namespace

extern "C" {

// Batched entry.  grad may be nullptr (loss only).  Returns 0 on success.
int rnnt_loss_cpu(const float* logits, const int32_t* labels,
                  const int32_t* xlen, const int32_t* ylen, int b, int t_max,
                  int u1_max, int v_size, int blank, float* loss,
                  float* grad) {
  if (grad)
    std::memset(grad, 0,
                sizeof(float) * static_cast<size_t>(b) * t_max * u1_max *
                    v_size);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; ++i) {
    const size_t off = static_cast<size_t>(i) * t_max * u1_max * v_size;
    loss[i] = rnnt_sample(logits + off, labels + static_cast<size_t>(i) *
                                                     (u1_max - 1),
                          xlen[i], ylen[i], t_max, u1_max, v_size, blank,
                          grad ? grad + off : nullptr);
  }
  return 0;
}

}  // extern "C"
