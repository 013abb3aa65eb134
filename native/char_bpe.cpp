// CharBPE merge engine — native replacement for the HuggingFace rust
// `tokenizers` backend the reference depends on (rnnt/tokenizer.py:5,80-104,
// requirements.txt `tokenizers==0.8.0.dev1`).
//
// Split of responsibilities: Python handles Unicode (lowercasing,
// whitespace/punctuation pre-tokenization, char→initial-symbol-id mapping,
// `</w>` word-end variants); this library runs the hot greedy
// lowest-merge-rank loop on int32 symbol sequences.  A merge table maps
// (left_id, right_id) → (rank, merged_id).

#include <climits>
#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

using std::size_t;

namespace {

struct MergeTable {
  // key: (left << 32) | right
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> merges;
};

inline uint64_t key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

}  // namespace

extern "C" {

void* bpe_create(int n_merges, const int32_t* left, const int32_t* right,
                 const int32_t* merged) {
  auto* t = new MergeTable();
  t->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int i = 0; i < n_merges; ++i)
    t->merges.emplace(key(left[i], right[i]), std::make_pair(i, merged[i]));
  return t;
}

void bpe_destroy(void* handle) { delete static_cast<MergeTable*>(handle); }

// Greedy BPE: repeatedly merge the lowest-rank adjacent pair.
// syms/out are int32 symbol ids; returns the output length.
int bpe_encode_word(void* handle, const int32_t* syms, int n, int32_t* out) {
  auto* t = static_cast<MergeTable*>(handle);
  std::vector<int32_t> w(syms, syms + n);
  while (w.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    int32_t best_merged = -1;
    for (size_t i = 0; i + 1 < w.size(); ++i) {
      auto it = t->merges.find(key(w[i], w[i + 1]));
      if (it != t->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_i = i;
        best_merged = it->second.second;
      }
    }
    if (best_merged < 0) break;
    w[best_i] = best_merged;
    w.erase(w.begin() + best_i + 1);
  }
  for (size_t i = 0; i < w.size(); ++i) out[i] = w[i];
  return static_cast<int>(w.size());
}

}  // extern "C"
