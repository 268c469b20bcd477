"""Fully on-device batched CTC prefix beam search.

The reference ships the whole (T, V) posterior matrix to host and runs
the prefix-beam recursion in Python per utterance
(model/encoder.py:182-260, after the infer.py:89-103 device->host
copy). The TPU-native version runs the *entire* search inside one XLA
program — log-softmax, per-frame top-K prune, beam expansion, prefix
merging and re-pruning — vectorised over the batch with `jax.vmap` and
scanned over frames with `lax.scan`, so the only device->host transfer
is the final n-best token ids and scores. It composes under `jax.jit`
with the encoder forward (engine decode_output="beam"): utterance in,
transcript candidates out, in a single compiled program.

Design notes (fixed shapes throughout — XLA-friendly):

- A beam entry is (tokens[Lcap], len, pb, pnb, h1, h2, last): the
  prefix buffer, its blank-/nonblank-ending log probabilities, and a
  pair of independent 32-bit rolling hashes of the token sequence.
- Prefix merging (the hash-map in the host/C++ searches) becomes a
  sort: each frame expands beam x K candidates into "stay" and
  "extend" entries keyed by the rolling hash of their target prefix,
  lexsorts the 2*beam*K entries by (h1, h2), merges equal-hash runs
  with a segment log-sum-exp (separately for pb and pnb — exactly the
  reference's accumulation cases), and keeps the top `beam` distinct
  prefixes. Two distinct prefixes only merge on a 64-bit double hash
  collision (~2^-64 per pair per frame — negligible against beam*K
  pairs).
- Frames at t >= out_len are masked no-ops, so one scan serves a
  padded batch of mixed lengths.

Hypotheses are identical to `m3asr_tpu.decode.ctc.ctc_prefix_beam_search`
(and the reference's search) for the same beam size: both prune to the
per-frame top-`beam` tokens first, then apply the same (pb, pnb)
recursion. Scores agree to float-accumulation order.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# rolling-hash multipliers/offsets for the two independent lanes
_M1, _A1 = 1000003, 1
_M2, _A2 = 0x85EBCA6B, 0x9E3779B9
_EMPTY_H1 = 2166136261
_EMPTY_H2 = 0x27D4EB2F


def _hash_extend(h1, h2, tok):
    """Extend the double rolling hash of a prefix by one token."""
    t = tok.astype(jnp.uint32)
    return (h1 * jnp.uint32(_M1) + t + jnp.uint32(_A1),
            h2 * jnp.uint32(_M2) + t + jnp.uint32(_A2))


def _junk_hashes(beam: int):
    """Distinct filler hashes for dead beam slots (probability mass
    -inf, so an accidental merge with a live prefix is a no-op)."""
    j = jnp.arange(beam, dtype=jnp.uint32)
    return (jnp.uint32(0xDEADBEEF) ^ (j * jnp.uint32(2654435761)),
            jnp.uint32(0x00C0FFEE) ^ (j * jnp.uint32(40503)))


def _segment_lse(x, seg, num_segments):
    """Log-sum-exp of `x` grouped by sorted segment ids; empty (all
    -inf) segments stay -inf."""
    m = jax.ops.segment_max(x, seg, num_segments=num_segments,
                            indices_are_sorted=True)
    mg = jnp.where(jnp.isfinite(m), m, 0.0)
    sums = jax.ops.segment_sum(
        jnp.where(jnp.isfinite(x), jnp.exp(x - mg[seg]), 0.0),
        seg, num_segments=num_segments, indices_are_sorted=True)
    return jnp.where(sums > 0, mg + jnp.log(sums), NEG_INF)


def _beam_step(state, frame, *, beam: int, blank_idx: int):
    """One frame of the prefix recursion over (K,) top-K candidates.

    The candidate cases mirror encoder.py:182-260 / decode/ctc.py:
      s == blank        : stay,  pb  += lse(pb, pnb) + ps
      s == last (!=bl)  : stay,  pnb += pnb + ps
                          extend, pnb += pb + ps   (after a blank)
      else              : extend, pnb += lse(pb, pnb) + ps
    """
    tokens, lens, pb, pnb, h1, h2, last = state
    vals, idx, valid = frame
    K = vals.shape[0]
    E = 2 * beam * K

    s = jnp.broadcast_to(idx[None, :], (beam, K))
    ps = jnp.broadcast_to(vals[None, :], (beam, K))
    pb_i, pnb_i = pb[:, None], pnb[:, None]
    lse_i = jnp.logaddexp(pb_i, pnb_i)
    is_blank = s == blank_idx
    is_rep = (s == last[:, None]) & ~is_blank
    parent = jnp.broadcast_to(jnp.arange(beam)[:, None], (beam, K))

    # stay entries: target prefix = parent prefix
    stay_pb = jnp.where(is_blank, lse_i + ps, NEG_INF)
    stay_pnb = jnp.where(is_rep, pnb_i + ps, NEG_INF)
    sh1 = jnp.broadcast_to(h1[:, None], (beam, K))
    sh2 = jnp.broadcast_to(h2[:, None], (beam, K))

    # extend entries: target prefix = parent prefix + s (never blank —
    # a blank extend carries -inf mass and a hash no live prefix has)
    ext_pnb = jnp.where(is_blank, NEG_INF,
                        jnp.where(is_rep, pb_i + ps, lse_i + ps))
    eh1, eh2 = _hash_extend(sh1, sh2, s)

    e_h1 = jnp.concatenate([sh1.ravel(), eh1.ravel()])
    e_h2 = jnp.concatenate([sh2.ravel(), eh2.ravel()])
    e_pb = jnp.concatenate([stay_pb.ravel(),
                            jnp.full(beam * K, NEG_INF)])
    e_pnb = jnp.concatenate([stay_pnb.ravel(), ext_pnb.ravel()])
    e_parent = jnp.concatenate([parent.ravel(), parent.ravel()])
    e_append = jnp.concatenate(
        [jnp.full(beam * K, -1, jnp.int32), s.ravel().astype(jnp.int32)])

    # merge equal prefixes: lexsort by hash, segment log-sum-exp
    order = jnp.lexsort((e_h2, e_h1))
    h1s, h2s = e_h1[order], e_h2[order]
    start = jnp.concatenate([
        jnp.array([True]),
        (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])])
    seg = jnp.cumsum(start) - 1
    m_pb = _segment_lse(e_pb[order], seg, E)
    m_pnb = _segment_lse(e_pnb[order], seg, E)
    score = jnp.logaddexp(m_pb, m_pnb)
    # one representative per segment (any entry reconstructs the same
    # prefix: stay keeps parent tokens, extend appends to its parent)
    pos_score = jnp.where(start, score[seg], NEG_INF)
    win_score, win_pos = jax.lax.top_k(pos_score, beam)
    wseg = seg[win_pos]
    wvalid = win_score > NEG_INF
    wparent = e_parent[order][win_pos]
    wappend = e_append[order][win_pos]

    do_app = (wappend >= 0) & wvalid
    ptoks = tokens[wparent]
    plen = lens[wparent]
    L = tokens.shape[1]
    at_end = jnp.arange(L)[None, :] == plen[:, None]
    ntoks = jnp.where(at_end & do_app[:, None], wappend[:, None], ptoks)
    nlen = jnp.where(wvalid, plen + do_app.astype(lens.dtype), 0)
    nlast = jnp.where(do_app, wappend, last[wparent])
    jh1, jh2 = _junk_hashes(beam)
    new = (ntoks,
           nlen,
           jnp.where(wvalid, m_pb[wseg], NEG_INF),
           jnp.where(wvalid, m_pnb[wseg], NEG_INF),
           jnp.where(wvalid, h1s[win_pos], jh1),
           jnp.where(wvalid, h2s[win_pos], jh2),
           jnp.where(wvalid, nlast, -1))

    # masked frames (t >= out_len) are no-ops
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(valid, n, o), new, state), None


def _search_one(values, indices, out_len, *, beam: int, blank_idx: int):
    """Scan the beam step over one utterance's (T, K) candidates."""
    T = values.shape[0]
    jh1, jh2 = _junk_hashes(beam)
    live0 = jnp.arange(beam) == 0
    state = (
        jnp.full((beam, T), -1, jnp.int32),          # tokens
        jnp.zeros((beam,), jnp.int32),               # lens
        jnp.where(live0, 0.0, NEG_INF),              # pb (empty prefix)
        jnp.full((beam,), NEG_INF),                  # pnb
        jnp.where(live0, jnp.uint32(_EMPTY_H1), jh1),
        jnp.where(live0, jnp.uint32(_EMPTY_H2), jh2),
        jnp.full((beam,), -1, jnp.int32),            # last token
    )
    frames = (values, indices, jnp.arange(T) < out_len)
    state, _ = jax.lax.scan(
        partial(_beam_step, beam=beam, blank_idx=blank_idx),
        state, frames)
    tokens, lens, pb, pnb = state[0], state[1], state[2], state[3]
    scores = jnp.logaddexp(pb, pnb)
    scores, order = jax.lax.top_k(scores, beam)   # best-first
    return tokens[order], lens[order], scores


@partial(jax.jit, static_argnames=("beam_size", "blank_idx"))
def ctc_beam_search_sparse_device(
        values: jnp.ndarray, indices: jnp.ndarray, out_lens: jnp.ndarray,
        beam_size: int, blank_idx: int = 0
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched on-device prefix beam search over per-frame top-K
    candidates (values/indices: (B, T, K) log-softmax scores + token
    ids, e.g. the engine's decode_output="topk" tensors, best-first or
    any order).

    Matches the host search exactly when K == beam_size (both searches
    then apply the same per-frame top-`beam` first prune; with
    K > beam_size the device search keeps more per-frame candidates —
    a wider, never worse, prune).

    Returns (tokens (B, beam, T) int32 padded with -1,
             lens (B, beam) int32, scores (B, beam) f32), best-first.
    """
    if beam_size < 1:
        raise ValueError("beam_size must be >= 1")
    k = values.shape[-1]
    if k > beam_size:
        # first prune = top-beam tokens, like the reference
        values, top = jax.lax.top_k(values, beam_size)
        indices = jnp.take_along_axis(indices, top, axis=-1)
    return jax.vmap(
        partial(_search_one, beam=beam_size, blank_idx=blank_idx)
        )(values.astype(jnp.float32), indices.astype(jnp.int32),
          out_lens.astype(jnp.int32))


@partial(jax.jit, static_argnames=("beam_size", "blank_idx"))
def ctc_beam_search_device(
        log_probs: jnp.ndarray, out_lens: jnp.ndarray, beam_size: int,
        blank_idx: int = 0
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched on-device prefix beam search over dense (B, T, V)
    log-softmax rows: per-frame top-`beam` prune (the reference's
    first prune) then the sparse search. Same return contract as
    `ctc_beam_search_sparse_device`."""
    k = min(beam_size, log_probs.shape[-1])
    vals, idx = jax.lax.top_k(log_probs, k)
    return ctc_beam_search_sparse_device(vals, idx, out_lens, beam_size,
                                         blank_idx)
