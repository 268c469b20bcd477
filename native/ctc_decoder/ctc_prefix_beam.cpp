// Fast CTC prefix beam search (C++ core for the host decode path).
//
// Same algorithm as m3asr_tpu/decode/ctc.py (the behavioral spec is the
// reference's trainer_3m_fix/model/encoder.py:182-260): per frame, take
// the top-k tokens, update (blank-ending, nonblank-ending) log-prob
// pairs per prefix, prune to beam_size prefixes by log_add(pb, pnb).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float log_add2(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  float m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

struct PrefixHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull + (h << 6) +
           (h >> 2);
    }
    return h;
  }
};

using Scores = std::pair<float, float>;  // (pb, pnb)
using HypMap = std::unordered_map<std::vector<int32_t>, Scores, PrefixHash>;

}  // namespace

extern "C" {

// log_probs: (T, V) row-major log-softmax scores.
// out_tokens: (nbest_cap * max_len) int32, row i = i-th best prefix,
//             padded with -1. out_lens: (nbest_cap) prefix lengths.
// out_scores: (nbest_cap) log_add(pb, pnb).
// Returns the number of hypotheses written (<= min(beam, nbest_cap)).
int ctc_prefix_beam_search(const float* log_probs, int T, int V,
                           int beam_size, int blank_idx, int nbest_cap,
                           int max_len, int32_t* out_tokens,
                           int32_t* out_lens, float* out_scores) {
  HypMap cur;
  cur.emplace(std::vector<int32_t>{}, Scores{0.0f, kNegInf});

  std::vector<int> top_idx(V);
  const int k = std::min(beam_size, V);

  std::vector<std::pair<std::vector<int32_t>, Scores>> cur_vec;
  cur_vec.emplace_back(std::vector<int32_t>{}, Scores{0.0f, kNegInf});

  for (int t = 0; t < T; ++t) {
    const float* logp = log_probs + static_cast<size_t>(t) * V;
    // first prune: top-k tokens this frame
    for (int i = 0; i < V; ++i) top_idx[i] = i;
    std::partial_sort(top_idx.begin(), top_idx.begin() + k, top_idx.end(),
                      [&](int a, int b) { return logp[a] > logp[b]; });

    HypMap next;
    next.reserve(cur_vec.size() * (k + 1));
    for (int i = 0; i < k; ++i) {
      const int s = top_idx[i];
      const float ps = logp[s];
      for (const auto& kv : cur_vec) {
        const auto& prefix = kv.first;
        const float pb = kv.second.first;
        const float pnb = kv.second.second;
        const int32_t last = prefix.empty() ? -1 : prefix.back();
        if (s == blank_idx) {
          auto& sc = next.try_emplace(prefix, Scores{kNegInf, kNegInf})
                         .first->second;
          sc.first = log_add2(sc.first, log_add2(pb + ps, pnb + ps));
        } else if (s == last) {
          {  // stay: *ss -> *s
            auto& sc = next.try_emplace(prefix, Scores{kNegInf, kNegInf})
                           .first->second;
            sc.second = log_add2(sc.second, pnb + ps);
          }
          {  // extend via blank: *s-s -> *ss
            std::vector<int32_t> np = prefix;
            np.push_back(s);
            auto& sc = next.try_emplace(std::move(np),
                                        Scores{kNegInf, kNegInf})
                           .first->second;
            sc.second = log_add2(sc.second, pb + ps);
          }
        } else {
          std::vector<int32_t> np = prefix;
          np.push_back(s);
          auto& sc = next.try_emplace(std::move(np),
                                      Scores{kNegInf, kNegInf})
                         .first->second;
          sc.second = log_add2(sc.second, log_add2(pb + ps, pnb + ps));
        }
      }
    }
    // second prune: keep beam_size best prefixes
    cur_vec.assign(next.begin(), next.end());
    const size_t keep =
        std::min(static_cast<size_t>(beam_size), cur_vec.size());
    std::partial_sort(
        cur_vec.begin(), cur_vec.begin() + keep, cur_vec.end(),
        [](const auto& a, const auto& b) {
          return log_add2(a.second.first, a.second.second) >
                 log_add2(b.second.first, b.second.second);
        });
    cur_vec.resize(keep);
  }

  const int n = std::min(static_cast<int>(cur_vec.size()), nbest_cap);
  for (int i = 0; i < n; ++i) {
    const auto& prefix = cur_vec[i].first;
    const int len = std::min(static_cast<int>(prefix.size()), max_len);
    out_lens[i] = len;
    out_scores[i] =
        log_add2(cur_vec[i].second.first, cur_vec[i].second.second);
    int32_t* row = out_tokens + static_cast<size_t>(i) * max_len;
    std::memcpy(row, prefix.data(), sizeof(int32_t) * len);
    for (int j = len; j < max_len; ++j) row[j] = -1;
  }
  return n;
}

// Greedy CTC: argmax -> collapse repeats -> drop blank.
// logits: (T, V); out: (max_len) int32. Returns hyp length.
int ctc_greedy_decode(const float* logits, int T, int V, int blank_idx,
                      int max_len, int32_t* out) {
  int n = 0;
  int prev = -1;
  for (int t = 0; t < T && n < max_len; ++t) {
    const float* row = logits + static_cast<size_t>(t) * V;
    int best = 0;
    float bv = row[0];
    for (int v = 1; v < V; ++v)
      if (row[v] > bv) { bv = row[v]; best = v; }
    if (best != prev && best != blank_idx) out[n++] = best;
    prev = best;
  }
  return n;
}

}  // extern "C"
