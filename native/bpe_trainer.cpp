// CharBPE TRAINER — completes the native replacement of the HF rust
// `tokenizers` dependency (the reference trains its BPE through the rust
// trainer, rnnt/tokenizer.py:80-104).  The encoder lives in char_bpe.cpp;
// this file learns the merges.
//
// Classic BPE with an efficient incremental implementation: pair counts are
// maintained under merges (only affected words are rewritten), and the
// current best pair comes from a lazy max-heap (stale entries are dropped
// on pop).  Tie-breaking matches the pure-Python trainer in
// edgedict_tpu/tokenizer.py exactly — (count, left-string, right-string)
// lexicographic max — so native and Python training produce identical
// vocab/merge tables (property-tested).

#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

using std::size_t;

namespace {

inline uint64_t pkey(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

struct Trainer {
  std::vector<std::string> names;               // symbol id → string
  std::vector<std::vector<int32_t>> words;
  std::vector<int64_t> freqs;
  std::unordered_map<uint64_t, int64_t> pair_counts;
  std::unordered_map<uint64_t, std::vector<int32_t>> pair_words;

  struct Entry {
    int64_t count;
    int32_t a, b;
  };
  struct Cmp {
    const Trainer* t;
    bool operator()(const Entry& x, const Entry& y) const {
      if (x.count != y.count) return x.count < y.count;   // max-heap
      if (t->names[x.a] != t->names[y.a])
        return t->names[x.a] < t->names[y.a];
      return t->names[x.b] < t->names[y.b];
    }
  };
  std::priority_queue<Entry, std::vector<Entry>, Cmp> heap{Cmp{this}};

  void bump(int32_t a, int32_t b, int64_t delta, int32_t word_id) {
    uint64_t k = pkey(a, b);
    int64_t& c = pair_counts[k];
    c += delta;
    if (delta > 0) {
      pair_words[k].push_back(word_id);
      heap.push({c, a, b});
    } else if (c > 0) {
      heap.push({c, a, b});
    }
  }

  void add_word(const int32_t* syms, int n, int64_t freq) {
    int32_t wid = static_cast<int32_t>(words.size());
    words.emplace_back(syms, syms + n);
    freqs.push_back(freq);
    for (int i = 0; i + 1 < n; ++i) bump(syms[i], syms[i + 1], freq, wid);
  }

  int train(int max_merges, int64_t min_frequency, int32_t* out_pairs) {
    int n_merges = 0;
    while (n_merges < max_merges) {
      // pop until a live entry surfaces
      int32_t a = -1, b = -1;
      int64_t count = 0;
      while (!heap.empty()) {
        Entry e = heap.top();
        auto it = pair_counts.find(pkey(e.a, e.b));
        int64_t cur = it == pair_counts.end() ? 0 : it->second;
        if (cur == e.count && cur > 0) {
          a = e.a;
          b = e.b;
          count = cur;
          break;
        }
        heap.pop();                               // stale
      }
      if (a < 0 || count < min_frequency) break;

      const int32_t merged = static_cast<int32_t>(names.size());
      names.push_back(names[a] + names[b]);
      out_pairs[2 * n_merges] = a;
      out_pairs[2 * n_merges + 1] = b;
      ++n_merges;

      // rewrite every word containing (a, b)
      uint64_t k = pkey(a, b);
      std::vector<int32_t> occ;
      occ.swap(pair_words[k]);
      std::sort(occ.begin(), occ.end());
      occ.erase(std::unique(occ.begin(), occ.end()), occ.end());
      pair_counts.erase(k);
      pair_words.erase(k);
      heap.pop();

      for (int32_t wid : occ) {
        auto& w = words[wid];
        const int64_t f = freqs[wid];
        bool has = false;
        for (size_t i = 0; i + 1 < w.size(); ++i)
          if (w[i] == a && w[i + 1] == b) {
            has = true;
            break;
          }
        if (!has) continue;                       // stale occurrence
        // subtract every old pair's contribution (re-pushing the lowered
        // count so the lazy heap can still surface it), rebuild the word,
        // then add every new pair's contribution
        for (size_t i = 0; i + 1 < w.size(); ++i) {
          uint64_t kk = pkey(w[i], w[i + 1]);
          if (kk == k) continue;                  // already erased
          auto it = pair_counts.find(kk);
          if (it != pair_counts.end()) {
            it->second -= f;
            if (it->second > 0)
              heap.push({it->second, w[i], w[i + 1]});
          }
        }
        std::vector<int32_t> nw;
        nw.reserve(w.size());
        for (size_t i = 0; i < w.size();) {
          if (i + 1 < w.size() && w[i] == a && w[i + 1] == b) {
            nw.push_back(merged);
            i += 2;
          } else {
            nw.push_back(w[i]);
            ++i;
          }
        }
        w.swap(nw);
        for (size_t i = 0; i + 1 < w.size(); ++i)
          bump(w[i], w[i + 1], f, wid);
      }
    }
    return n_merges;
  }
};

}  // namespace

extern "C" {

void* bpe_trainer_create() { return new Trainer(); }

void bpe_trainer_destroy(void* t) { delete static_cast<Trainer*>(t); }

// Register a symbol string; its id is the registration order.
int32_t bpe_trainer_add_symbol(void* t, const char* name) {
  auto* tr = static_cast<Trainer*>(t);
  tr->names.emplace_back(name);
  return static_cast<int32_t>(tr->names.size() - 1);
}

void bpe_trainer_add_word(void* t, const int32_t* syms, int n,
                          int64_t freq) {
  static_cast<Trainer*>(t)->add_word(syms, n, freq);
}

// Learn up to max_merges merges; writes (a, b) id pairs row-wise into
// out_pairs; merged symbol i gets id n_initial_symbols + i.  Returns the
// number of merges learned.
int bpe_trainer_train(void* t, int max_merges, int64_t min_frequency,
                      int32_t* out_pairs) {
  return static_cast<Trainer*>(t)->train(max_merges, min_frequency,
                                         out_pairs);
}

}  // extern "C"
