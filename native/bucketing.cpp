// Batch bucketing — native equivalent of the reference's Cython
// data_utils_fast.pyx (rnnt/data_utils_fast.pyx:28-123):
//   * batch_by_size: greedy token-budget batching with bsz_mult rounding
//   * batch_fixed_shapes: pack length-sorted indices into a sorted menu of
//     fixed (batch_size, max_len) shapes — exactly the static-shape
//     bucketing a jit-compiled TPU input pipeline needs (SURVEY.md §2.3).

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

inline bool is_batch_full(int64_t num_sentences, int64_t num_tokens,
                          int64_t max_tokens, int64_t max_sentences) {
  if (num_sentences == 0) return false;
  if (max_sentences > 0 && num_sentences == max_sentences) return true;
  if (max_tokens > 0 && num_tokens > max_tokens) return true;
  return false;
}

}  // namespace

extern "C" {

// Greedy token-budget batching.  indices/num_tokens_vec are parallel arrays
// (num_tokens_vec[i] = length of sample indices[i]).  Writes flattened
// batches into out_indices and per-batch sizes into out_sizes; returns the
// number of batches.  out_indices must hold n entries, out_sizes up to n.
int batch_by_size(const int64_t* indices, const int64_t* num_tokens_vec,
                  int64_t n, int64_t max_tokens, int64_t max_sentences,
                  int64_t bsz_mult, int64_t* out_indices,
                  int64_t* out_sizes) {
  std::vector<int64_t> batch, batch_lens;
  batch.reserve(256);
  batch_lens.reserve(256);
  int64_t sample_len = 0;     // max length inside the current batch
  int n_batches = 0;
  int64_t out_pos = 0;

  for (int64_t i = 0; i < n; ++i) {
    const int64_t idx = indices[i];
    const int64_t num_tokens = num_tokens_vec[i];
    sample_len = std::max(sample_len, num_tokens);
    const int64_t num_tok_batch =
        (static_cast<int64_t>(batch.size()) + 1) * sample_len;
    if (is_batch_full(static_cast<int64_t>(batch.size()), num_tok_batch,
                      max_tokens, max_sentences)) {
      // bsz_mult rounding: emit the largest multiple, keep the remainder
      const int64_t bsz = static_cast<int64_t>(batch.size());
      const int64_t mod_len =
          std::max(bsz_mult * (bsz / bsz_mult), bsz % bsz_mult);
      out_sizes[n_batches++] = mod_len;
      for (int64_t j = 0; j < mod_len; ++j) out_indices[out_pos++] = batch[j];
      batch.erase(batch.begin(), batch.begin() + mod_len);
      batch_lens.erase(batch_lens.begin(), batch_lens.begin() + mod_len);
      sample_len = num_tokens;
      for (int64_t l : batch_lens) sample_len = std::max(sample_len, l);
    }
    batch.push_back(idx);
    batch_lens.push_back(num_tokens);
  }
  if (!batch.empty()) {
    out_sizes[n_batches++] = static_cast<int64_t>(batch.size());
    for (int64_t v : batch) out_indices[out_pos++] = v;
  }
  return n_batches;
}

// Fixed-shape packing: shapes is a (n_shapes, 2) array of
// (batch_size, max_len) sorted by max_len ascending; indices sorted by
// length DESCENDING.  Each batch takes the smallest shape whose max_len
// fits its longest (first) sample.  Returns number of batches; out layout
// as in batch_by_size, out_shape_ids records the menu row used per batch.
int batch_fixed_shapes(const int64_t* indices, const int64_t* num_tokens_vec,
                       int64_t n, const int64_t* shapes, int64_t n_shapes,
                       int64_t* out_indices, int64_t* out_sizes,
                       int64_t* out_shape_ids) {
  int n_batches = 0;
  int64_t out_pos = 0;
  int64_t i = 0;
  while (i < n) {
    const int64_t len = num_tokens_vec[i];
    // smallest menu shape that fits this length
    int64_t s = -1;
    for (int64_t k = 0; k < n_shapes; ++k) {
      if (shapes[k * 2 + 1] >= len) {
        s = k;
        break;
      }
    }
    if (s < 0) {  // longer than every shape: skip the sample
      ++i;
      continue;
    }
    const int64_t bsz = shapes[s * 2];
    const int64_t take = std::min(bsz, n - i);
    out_sizes[n_batches] = take;
    out_shape_ids[n_batches] = s;
    ++n_batches;
    for (int64_t j = 0; j < take; ++j) out_indices[out_pos++] = indices[i + j];
    i += take;
  }
  return n_batches;
}

}  // extern "C"
