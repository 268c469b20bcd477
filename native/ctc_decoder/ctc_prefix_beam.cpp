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

// ARPA backoff n-gram over token ids (m3asr_tpu/decode/lm.py NgramLM is
// the behavioral spec; this is its flat-array twin so beam+LM decode
// keeps the C++ speed). One table keyed by the full ngram: value =
// (logp, backoff) in natural log, backoff 0 when unlisted — backoff
// keys are always a subset of logp keys in ARPA.
struct NgramLM {
  std::unordered_map<std::vector<int32_t>, std::pair<float, float>,
                     PrefixHash>
      table;
  int order = 0;

  float logp_backoff(std::vector<int32_t> hist, int32_t w) const {
    float acc = 0.0f;
    for (;;) {
      std::vector<int32_t> key = hist;
      key.push_back(w);
      auto it = table.find(key);
      if (it != table.end()) return acc + it->second.first;
      if (hist.empty()) {
        // unigram fallback: <unk> (id -3) if listed, else a hard floor
        auto unk = table.find(std::vector<int32_t>{-3});
        return acc + (unk != table.end() ? unk->second.first
                                         : -20.0f * 2.302585092994046f);
      }
      auto bo = table.find(hist);
      if (bo != table.end()) acc += bo->second.second;
      hist.erase(hist.begin());
    }
  }

  std::vector<int32_t> shrink(std::vector<int32_t> hist) const {
    if (order > 1 &&
        hist.size() > static_cast<size_t>(order - 1))
      hist.erase(hist.begin(),
                 hist.end() - (order - 1));
    if (order <= 1) hist.clear();
    while (!hist.empty() && !table.count(hist)) hist.erase(hist.begin());
    return hist;
  }

  // returns ln P(w | state) and advances state in place
  float score(std::vector<int32_t>& state, int32_t w) const {
    const float lp = logp_backoff(state, w);
    state.push_back(w);
    state = shrink(std::move(state));
    return lp;
  }
};

// Context-biasing prefix trie (m3asr_tpu/decode/ctc.py ContextTrie is
// the behavioral spec): `bonus` per matched token, refund of the
// unfinished suffix on divergence (completed phrases keep theirs).
struct ContextTrie {
  std::vector<std::unordered_map<int32_t, int>> children{1};
  std::vector<int> refund{0};
  std::vector<bool> is_end{false};
  float bonus = 0.0f;
  bool active = false;

  void build(const int32_t* ctx_tokens, const int32_t* ctx_offsets,
             int n_ctx, float ctx_bonus) {
    bonus = ctx_bonus;
    active = n_ctx > 0;
    for (int p = 0; p < n_ctx; ++p) {
      int node = 0;
      for (int32_t i = ctx_offsets[p]; i < ctx_offsets[p + 1]; ++i) {
        const int32_t tok = ctx_tokens[i];
        auto it = children[node].find(tok);
        if (it == children[node].end()) {
          const int nxt = static_cast<int>(children.size());
          children[node][tok] = nxt;
          children.emplace_back();
          refund.push_back(0);
          is_end.push_back(false);
          node = nxt;
        } else {
          node = it->second;
        }
      }
      if (node != 0) is_end[node] = true;
    }
    // refund[n] = tokens matched since the last completed phrase
    std::vector<int> stack{0};
    while (!stack.empty()) {
      const int node = stack.back();
      stack.pop_back();
      for (const auto& kv : children[node]) {
        refund[kv.second] = is_end[kv.second] ? 0 : refund[node] + 1;
        stack.push_back(kv.second);
      }
    }
  }

  std::pair<int, float> advance(int state, int32_t token) const {
    float delta = 0.0f;
    auto it = children[state].find(token);
    if (it == children[state].end()) {
      delta -= bonus * refund[state];
      it = children[0].find(token);
      if (it == children[0].end()) return {0, delta};
    }
    delta += bonus;
    if (children[it->second].empty()) return {0, delta};  // leaf
    return {it->second, delta};
  }
};

// Incremental extended prefix beam (the stateful core shared by the
// one-shot ctc_prefix_beam_search_ext and the streaming beam_state_*
// C ABI; m3asr_tpu/decode/ctc.py PrefixBeamState is the spec).
struct BeamState {
  int beam_size, blank_idx;
  ContextTrie trie;
  const NgramLM* lm = nullptr;  // not owned
  float lm_weight = 0.0f;
  int t = 0;  // absolute frame counter

  struct Ext {
    float pb, pnb;
    std::vector<int32_t> times;
    float last_prob;  // frame log-prob that set times.back()
    float best_nb;    // strongest single contribution (its times win)
    int ctx_state;
    float ctx_score;
    std::vector<int32_t> lm_state;
    float lm_score;
  };
  std::vector<std::pair<std::vector<int32_t>, Ext>> cur_vec;
  std::vector<int> top_idx;

  BeamState(int beam, int blank) : beam_size(beam), blank_idx(blank) {}

  void reset() {
    t = 0;
    std::vector<int32_t> lm0;
    if (lm) lm0 = lm->shrink({-1});  // <s> context (BOS id -1)
    cur_vec.clear();
    cur_vec.emplace_back(
        std::vector<int32_t>{},
        Ext{0.0f, kNegInf, {}, kNegInf, kNegInf, 0, 0.0f, lm0, 0.0f});
  }

  void advance(const float* log_probs, int T, int V) {
    if (static_cast<int>(top_idx.size()) < V) top_idx.resize(V);
    const int k = std::min(beam_size, V);
    std::vector<int32_t> cand(k);
    std::vector<float> cvals(k);
    for (int f = 0; f < T; ++f, ++t) {
      const float* logp = log_probs + static_cast<size_t>(f) * V;
      for (int i = 0; i < V; ++i) top_idx[i] = i;
      std::partial_sort(top_idx.begin(), top_idx.begin() + k,
                        top_idx.begin() + V,
                        [&](int a, int b) { return logp[a] > logp[b]; });
      for (int i = 0; i < k; ++i) {
        cand[i] = top_idx[i];
        cvals[i] = logp[cand[i]];
      }
      step_frame(cand.data(), cvals.data(), k);
    }
  }

  // Sparse-candidate advance: per frame, `idx`/`vals` carry the K
  // best tokens already selected ON DEVICE (engine decode_output
  // "topk" — jax.lax.top_k returns them sorted best-first), so only
  // (T, K) crosses D2H instead of (T, V). Uses the best
  // min(K, beam_size) per frame — identical hypotheses to the dense
  // path when K >= beam_size (the dense path's first prune is the
  // same top-k).
  void advance_sparse(const float* vals, const int32_t* idx, int T,
                      int K) {
    const int k = std::min(beam_size, K);
    for (int f = 0; f < T; ++f, ++t)
      step_frame(idx + static_cast<size_t>(f) * K,
                 vals + static_cast<size_t>(f) * K, k);
  }

  // One frame of the prefix recursion over an explicit candidate list
  // (cand[i] scored cvals[i]); shared by the dense and sparse drivers.
  void step_frame(const int32_t* cand, const float* cvals, int k) {
    using ExtMap =
        std::unordered_map<std::vector<int32_t>, Ext, PrefixHash>;
    {
      ExtMap next;
      next.reserve(cur_vec.size() * (k + 1));
      // get/create the accumulator for a next-prefix; context/LM states
      // are pure functions of the tokens: computed once, on creation
      auto entry = [&](std::vector<int32_t>&& prefix, const Ext& parent,
                       int32_t s /* -1 = same-prefix source */) -> Ext& {
        auto it = next.find(prefix);
        if (it != next.end()) return it->second;
        Ext e{kNegInf, kNegInf, parent.times, parent.last_prob, kNegInf,
              parent.ctx_state, parent.ctx_score, parent.lm_state,
              parent.lm_score};
        if (s >= 0) {
          e.times.push_back(t);
          e.last_prob = kNegInf;
          if (trie.active) {
            auto adv = trie.advance(parent.ctx_state, s);
            e.ctx_state = adv.first;
            e.ctx_score = parent.ctx_score + adv.second;
          }
          if (lm) e.lm_score += lm_weight * lm->score(e.lm_state, s);
        }
        return next.emplace(std::move(prefix), std::move(e))
            .first->second;
      };
      auto offer_times = [](Ext& e, float contrib,
                            const std::vector<int32_t>& times,
                            float last_prob) {
        if (contrib > e.best_nb) {
          e.best_nb = contrib;
          e.times = times;
          e.last_prob = last_prob;
        }
      };

      for (int i = 0; i < k; ++i) {
        const int32_t s = cand[i];
        const float ps = cvals[i];
        for (const auto& kv : cur_vec) {
          const auto& prefix = kv.first;
          const Ext& src = kv.second;
          const int32_t last = prefix.empty() ? -1 : prefix.back();
          if (s == blank_idx) {
            Ext& e = entry(std::vector<int32_t>(prefix), src, -1);
            const float contrib = log_add2(src.pb + ps, src.pnb + ps);
            e.pb = log_add2(e.pb, contrib);
            offer_times(e, contrib, src.times, src.last_prob);
          } else if (s == last) {
            {  // stay: *ss -> *s; peak frame of the last token may move
              Ext& e = entry(std::vector<int32_t>(prefix), src, -1);
              std::vector<int32_t> st = src.times;
              float sl = src.last_prob;
              if (ps > src.last_prob) {
                st.back() = t;
                sl = ps;
              }
              e.pnb = log_add2(e.pnb, src.pnb + ps);
              offer_times(e, src.pnb + ps, st, sl);
            }
            {  // extend via blank: *s-s -> *ss
              std::vector<int32_t> np = prefix;
              np.push_back(s);
              Ext& e = entry(std::move(np), src, s);
              std::vector<int32_t> nt = src.times;
              nt.push_back(t);
              e.pnb = log_add2(e.pnb, src.pb + ps);
              offer_times(e, src.pb + ps, nt, ps);
            }
          } else {
            std::vector<int32_t> np = prefix;
            np.push_back(s);
            Ext& e = entry(std::move(np), src, s);
            std::vector<int32_t> nt = src.times;
            nt.push_back(t);
            const float contrib = log_add2(src.pb + ps, src.pnb + ps);
            e.pnb = log_add2(e.pnb, contrib);
            offer_times(e, contrib, nt, ps);
          }
        }
      }
      cur_vec.assign(std::make_move_iterator(next.begin()),
                     std::make_move_iterator(next.end()));
      const size_t keep =
          std::min(static_cast<size_t>(beam_size), cur_vec.size());
      std::partial_sort(
          cur_vec.begin(), cur_vec.begin() + keep, cur_vec.end(),
          [](const auto& a, const auto& b) {
            return log_add2(a.second.pb, a.second.pnb) +
                       a.second.ctx_score + a.second.lm_score >
                   log_add2(b.second.pb, b.second.pnb) +
                       b.second.ctx_score + b.second.lm_score;
          });
      cur_vec.resize(keep);
    }
  }

  // final scores (+ refund of unfinished context matches), best-first
  int write_nbest(int nbest_cap, int max_len, int32_t* out_tokens,
                  int32_t* out_lens, float* out_scores,
                  int32_t* out_times) const {
    std::vector<
        std::pair<float, const std::pair<std::vector<int32_t>, Ext>*>>
        ranked;
    ranked.reserve(cur_vec.size());
    for (const auto& kv : cur_vec) {
      float score = log_add2(kv.second.pb, kv.second.pnb) +
                    kv.second.ctx_score + kv.second.lm_score;
      if (trie.active) score -= trie.bonus * trie.refund[kv.second.ctx_state];
      ranked.emplace_back(score, &kv);
    }
    std::sort(
        ranked.begin(), ranked.end(),
        [](const auto& a, const auto& b) { return a.first > b.first; });

    const int n = std::min(static_cast<int>(ranked.size()), nbest_cap);
    for (int i = 0; i < n; ++i) {
      const auto& prefix = ranked[i].second->first;
      const auto& ext = ranked[i].second->second;
      const int len = std::min(static_cast<int>(prefix.size()), max_len);
      out_lens[i] = len;
      out_scores[i] = ranked[i].first;
      int32_t* row = out_tokens + static_cast<size_t>(i) * max_len;
      int32_t* trow = out_times + static_cast<size_t>(i) * max_len;
      std::memcpy(row, prefix.data(), sizeof(int32_t) * len);
      std::memcpy(trow, ext.times.data(), sizeof(int32_t) * len);
      for (int j = len; j < max_len; ++j) {
        row[j] = -1;
        trow[j] = -1;
      }
    }
    return n;
  }
};

}  // namespace

extern "C" {

// Build an n-gram LM from flattened arrays (natural-log values):
// ids = concatenated ngram token ids, offsets = (n_ngrams + 1) prefix
// offsets, logps/backoffs per ngram (backoff 0 when unlisted).
// Returns an opaque handle for ctc_prefix_beam_search_ext; free with
// ngram_lm_free. The handle is read-only at decode time (thread-safe
// across the batch decoder's threads).
void* ngram_lm_create(const int32_t* ids, const int32_t* offsets,
                      int n_ngrams, const float* logps,
                      const float* backoffs, int order) {
  auto* lm = new NgramLM();
  lm->order = order;
  lm->table.reserve(static_cast<size_t>(n_ngrams) * 2);
  for (int i = 0; i < n_ngrams; ++i) {
    std::vector<int32_t> key(ids + offsets[i], ids + offsets[i + 1]);
    lm->table.emplace(std::move(key),
                      std::make_pair(logps[i], backoffs[i]));
  }
  return lm;
}

void ngram_lm_free(void* lm) { delete static_cast<NgramLM*>(lm); }

// Score one token from a history (for binding-level parity tests):
// hist = (hist_len) ids; returns ln P(w | hist).
float ngram_lm_logp(const void* lm, const int32_t* hist, int hist_len,
                    int32_t w) {
  const auto* m = static_cast<const NgramLM*>(lm);
  std::vector<int32_t> h(hist, hist + hist_len);
  return m->logp_backoff(m->shrink(std::move(h)), w);
}

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

// Extended prefix beam search: per-token emission frames (the frame of
// each token's probability peak; the strongest nonblank path wins on
// prefix merges) and optional context biasing (prefix trie over the
// ctx phrases; `bonus` per matched token, unfinished partial matches
// refunded — same semantics as m3asr_tpu/decode/ctc.py
// ctc_prefix_beam_search_ext, which is the behavioral spec).
//
// ctx_tokens: concatenated phrase token ids; ctx_offsets: (n_ctx + 1)
// prefix offsets into ctx_tokens; n_ctx == 0 disables biasing.
// out_times: (nbest_cap * max_len) int32, -1 padded.
int ctc_prefix_beam_search_ext(const float* log_probs, int T, int V,
                               int beam_size, int blank_idx, int nbest_cap,
                               int max_len, const int32_t* ctx_tokens,
                               const int32_t* ctx_offsets, int n_ctx,
                               float ctx_bonus, const void* lm_handle,
                               float lm_weight, int32_t* out_tokens,
                               int32_t* out_lens, float* out_scores,
                               int32_t* out_times) {
  BeamState st(beam_size, blank_idx);
  st.trie.build(ctx_tokens, ctx_offsets, n_ctx, ctx_bonus);
  st.lm = static_cast<const NgramLM*>(lm_handle);
  st.lm_weight = lm_weight;
  st.reset();
  st.advance(log_probs, T, V);
  return st.write_nbest(nbest_cap, max_len, out_tokens, out_lens,
                        out_scores, out_times);
}

// Sparse-candidate extended prefix beam search: `vals`/`idx` are the
// (T, K) per-frame top-K log-softmax values and token ids, already
// selected on device (engine decode_output "topk"), sorted best-first
// per frame. Identical hypotheses to ctc_prefix_beam_search_ext when
// K >= beam_size; only (T, K) floats+ints cross the host boundary
// instead of (T, V).
int ctc_prefix_beam_search_sparse_ext(
    const float* vals, const int32_t* idx, int T, int K, int beam_size,
    int blank_idx, int nbest_cap, int max_len, const int32_t* ctx_tokens,
    const int32_t* ctx_offsets, int n_ctx, float ctx_bonus,
    const void* lm_handle, float lm_weight, int32_t* out_tokens,
    int32_t* out_lens, float* out_scores, int32_t* out_times) {
  BeamState st(beam_size, blank_idx);
  st.trie.build(ctx_tokens, ctx_offsets, n_ctx, ctx_bonus);
  st.lm = static_cast<const NgramLM*>(lm_handle);
  st.lm_weight = lm_weight;
  st.reset();
  st.advance_sparse(vals, idx, T, K);
  return st.write_nbest(nbest_cap, max_len, out_tokens, out_lens,
                        out_scores, out_times);
}

// ---- Stateful streaming beam (chunk-incremental) --------------------
// beam_state_create builds a decoder that advance()s over logit chunks
// and reports nbest at any point — the C++ twin of
// m3asr_tpu/decode/ctc.py PrefixBeamState for streaming serving. The
// optional lm handle (ngram_lm_create) is borrowed, NOT owned: keep it
// alive for the state's lifetime. One state = one stream (not
// thread-safe across concurrent advance() calls).
void* beam_state_create(int beam_size, int blank_idx,
                        const int32_t* ctx_tokens,
                        const int32_t* ctx_offsets, int n_ctx,
                        float ctx_bonus, const void* lm_handle,
                        float lm_weight) {
  auto* st = new BeamState(beam_size, blank_idx);
  st->trie.build(ctx_tokens, ctx_offsets, n_ctx, ctx_bonus);
  st->lm = static_cast<const NgramLM*>(lm_handle);
  st->lm_weight = lm_weight;
  st->reset();
  return st;
}

void beam_state_free(void* st) { delete static_cast<BeamState*>(st); }

void beam_state_reset(void* st) { static_cast<BeamState*>(st)->reset(); }

// log_probs: (T, V) log-softmax chunk; frames accumulate across calls
// (timestamps are absolute).
void beam_state_advance(void* st, const float* log_probs, int T, int V) {
  static_cast<BeamState*>(st)->advance(log_probs, T, V);
}

// Sparse twin: (T, K) on-device-selected top-K values + token ids per
// frame (sorted best-first), as emitted by engine decode_output "topk".
void beam_state_advance_sparse(void* st, const float* vals,
                               const int32_t* idx, int T, int K) {
  static_cast<BeamState*>(st)->advance_sparse(vals, idx, T, K);
}

int beam_state_nbest(const void* st, int nbest_cap, int max_len,
                     int32_t* out_tokens, int32_t* out_lens,
                     float* out_scores, int32_t* out_times) {
  return static_cast<const BeamState*>(st)->write_nbest(
      nbest_cap, max_len, out_tokens, out_lens, out_scores, out_times);
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
