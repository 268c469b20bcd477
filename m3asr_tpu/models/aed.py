"""AED transformer decoder + attention rescoring.

Rebuilds trainer_3m_fix/layer/att_decoder.py (DecoderLayer /
TransformerDecoder / BiTransformerDecoder) and the attention-rescoring
flow sketched in model/ctc_aed.py:160-252: CTC prefix-beam nbest →
batch-score each hypothesis with the (bi)decoder → combine with the CTC
score.

Decoder FFN activation is ReLU (positionwise_feed_forward.py:71
default), unlike the encoder's SiLU. Token embedding is
Embedding * sqrt(d) + sinusoid PE (att_decoder.py:184-188 +
positional_encoding.py:50-67).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3asr_tpu.config import DecoderConfig
from m3asr_tpu.ops.attention import mha
from m3asr_tpu.ops.common import (init_layer_norm, init_linear, layer_norm,
                                  linear)
from m3asr_tpu.ops.masking import make_valid_mask, subsequent_mask
from m3asr_tpu.ops import positional


def add_sos_eos(ys_pad: np.ndarray, ys_lens: np.ndarray, sos: int, eos: int,
                ignore_id: int) -> Tuple[np.ndarray, np.ndarray]:
    """Prepend sos / append eos per utterance (utils/common.py
    add_sos_eos semantics). Host-side numpy."""
    B, U = ys_pad.shape
    ys_in = np.full((B, U + 1), ignore_id, ys_pad.dtype)
    ys_out = np.full((B, U + 1), ignore_id, ys_pad.dtype)
    ys_in[:, 0] = sos
    for b in range(B):
        n = int(ys_lens[b])
        ys_in[b, 1:n + 1] = ys_pad[b, :n]
        ys_out[b, :n] = ys_pad[b, :n]
        ys_out[b, n] = eos
    return ys_in, ys_out


def reverse_pad_list(ys_pad: np.ndarray, ys_lens: np.ndarray,
                     pad_value: int) -> np.ndarray:
    """Reverse each sequence within its valid length (utils/common.py
    reverse_pad_list)."""
    out = np.full_like(ys_pad, pad_value)
    for b in range(ys_pad.shape[0]):
        n = int(ys_lens[b])
        out[b, :n] = ys_pad[b, :n][::-1]
    return out


def _decoder_layer(p, x, tgt_mask, memory, memory_lens, num_heads):
    """One decoder block (att_decoder.py:18-143, pre-norm path)."""
    residual = x
    h = layer_norm(p["norm1"], x)
    h = mha(p["self_attn"], h, h, h, None, num_heads, mask=tgt_mask)
    x = residual + h

    residual = x
    h = layer_norm(p["norm2"], x)
    h = mha(p["src_attn"], h, memory, memory, memory_lens, num_heads)
    x = residual + h

    residual = x
    h = layer_norm(p["norm3"], x)
    h = linear(p["feed_forward"]["w_2"],
               jax.nn.relu(linear(p["feed_forward"]["w_1"], h)))
    return residual + h


def forward(p, cfg: DecoderConfig, memory: jax.Array,
            memory_lens: jax.Array, ys_in: jax.Array,
            ys_in_lens: jax.Array) -> jax.Array:
    """Teacher-forced decoder scores (TransformerDecoder.forward,
    att_decoder.py:212-258). Returns (B, U, V) logits."""
    B, U = ys_in.shape
    d = memory.shape[-1]
    emb = jnp.take(p["embed"]["weight"], ys_in, axis=0)  # (B, U, d)
    x, _ = positional.abs_positional_encoding(p["pos_enc"]["pe"], emb)

    causal = subsequent_mask(U)[None, None]                 # (1,1,U,U)
    pad = make_valid_mask(ys_in_lens, U)[:, None, None, :]  # (B,1,1,U)
    tgt_mask = causal & pad

    def body(h, layer_p):
        h = _decoder_layer(layer_p, h, tgt_mask, memory, memory_lens,
                           cfg.attention_heads)
        return h, None

    x, _ = jax.lax.scan(body, x, p["decoders"])
    x = layer_norm(p["after_norm"], x)
    return linear(p["output_layer"], x)


def init_cache(cfg: DecoderConfig, batch: int, max_len: int, d_model: int,
               dtype=jnp.float32) -> jax.Array:
    """Decode cache for forward_one_step: per-layer INPUT hidden states
    at every emitted position, (L, B, max_len, d). Static shape — the
    TPU replacement for the reference's growing per-layer cache list
    (att_decoder.py:258-300)."""
    return jnp.zeros((cfg.num_blocks, batch, max_len, d_model), dtype)


def forward_one_step(p, cfg: DecoderConfig, memory: jax.Array,
                     memory_lens: jax.Array, tgt: jax.Array,
                     pos, cache: jax.Array):
    """One incremental decode step (TransformerDecoder.forward_one_step,
    att_decoder.py:258-300): score position `pos` given the cached
    prefix, recomputing only the last-position query per layer.

    The torch original re-embeds the whole prefix and concatenates a
    growing cache; here the cache is a fixed (L, B, U, d) buffer of each
    layer's input hiddens, written at `pos` and attended under an
    iota<=pos mask — fully static shapes, so the step jits once and is
    drivable from lax.scan/while_loop.

    tgt: (B,) int32 token ids at position `pos` (traced scalar ok).
    Returns (log_probs (B, V), new_cache).
    """
    d = memory.shape[-1]
    U = cache.shape[2]
    num_heads = cfg.attention_heads
    emb = jnp.take(p["embed"]["weight"], tgt, axis=0)          # (B, d)
    pe = jax.lax.dynamic_slice_in_dim(p["pos_enc"]["pe"], pos, 1, axis=0)
    x = emb * jnp.asarray(np.sqrt(d), emb.dtype) + pe.astype(emb.dtype)
    key_ok = (jnp.arange(U) <= pos)[None, None, None, :]       # (1,1,1,U)

    def body(x_new, inputs):
        layer_p, cache_l = inputs
        cache_l = jax.lax.dynamic_update_slice(
            cache_l, x_new[:, None, :], (0, pos, 0))
        # self-attn: q/k/v are norm1 of the layer input (att_decoder.py
        # pre-norm path; keys = norm1(full prefix), query = last pos)
        kv = layer_norm(layer_p["norm1"], cache_l)
        q = layer_norm(layer_p["norm1"], x_new[:, None, :])
        h = mha(layer_p["self_attn"], q, kv, kv, None, num_heads,
                mask=key_ok)
        xq = x_new[:, None, :] + h

        residual = xq
        h = layer_norm(layer_p["norm2"], xq)
        h = mha(layer_p["src_attn"], h, memory, memory, memory_lens,
                num_heads)
        xq = residual + h

        residual = xq
        h = layer_norm(layer_p["norm3"], xq)
        h = linear(layer_p["feed_forward"]["w_2"],
                   jax.nn.relu(linear(layer_p["feed_forward"]["w_1"], h)))
        xq = residual + h
        return xq[:, 0, :], cache_l

    x, new_cache = jax.lax.scan(body, x, (p["decoders"], cache))
    y = layer_norm(p["after_norm"], x)
    y = jax.nn.log_softmax(linear(p["output_layer"], y), axis=-1)
    return y, new_cache


def score_hyps(p, cfg: DecoderConfig, memory: jax.Array,
               memory_lens: jax.Array, hyps: Sequence[Sequence[int]],
               sos: int, eos: int, ignore_id: int,
               reverse: bool = False) -> np.ndarray:
    """Attention-rescoring scores: per hypothesis, sum of teacher-forced
    log-probs incl. the final eos (ctc_aed.py:200-251 semantics).
    memory: (1, T, d) single utterance; hyps: nbest token lists.
    Returns (nbest,) float scores."""
    n = len(hyps)
    U = max((len(h) for h in hyps), default=0)
    ys = np.full((n, U), ignore_id, np.int32)
    lens = np.zeros((n,), np.int32)
    for i, h in enumerate(hyps):
        seq = list(h)[::-1] if reverse else list(h)
        ys[i, :len(seq)] = seq
        lens[i] = len(seq)
    ys_in, ys_out = add_sos_eos(ys, lens, sos, eos, ignore_id)
    mem = jnp.broadcast_to(memory, (n,) + memory.shape[1:])
    mlens = jnp.broadcast_to(memory_lens, (n,))
    logits = forward(p, cfg, mem, mlens, jnp.asarray(ys_in),
                     jnp.asarray(lens + 1))
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    logp = np.asarray(logp)
    scores = np.zeros((n,), np.float64)
    for i in range(n):
        for u in range(int(lens[i]) + 1):
            scores[i] += logp[i, u, int(ys_out[i, u])]
    return scores


def attention_rescoring(decoder_params, cfg: DecoderConfig,
                        nbest: List[Tuple[Tuple[int, ...], float]],
                        encoder_out: jax.Array, encoder_len: int,
                        sos: int, eos: int, ignore_id: int,
                        ctc_weight: float = 0.5,
                        reverse_weight: float = 0.0) -> Tuple[List[int], float]:
    """Pick the best CTC-nbest hypothesis by decoder score + ctc_weight *
    ctc score (the commented reference impl, ctc_aed.py:160-252)."""
    hyps = [list(h) for h, _ in nbest]
    ctc_scores = np.array([s for _, s in nbest])
    mlens = jnp.asarray([encoder_len], jnp.int32)
    p = decoder_params
    left = p.get("left_decoder", p)
    att = score_hyps(left, cfg, encoder_out, mlens, hyps, sos, eos,
                     ignore_id)
    if reverse_weight > 0.0 and "right_decoder" in p:
        r_att = score_hyps(p["right_decoder"], cfg, encoder_out, mlens,
                           hyps, sos, eos, ignore_id, reverse=True)
        att = (1.0 - reverse_weight) * att + reverse_weight * r_att
    total = att + ctc_weight * ctc_scores
    best = int(np.argmax(total))
    return hyps[best], float(total[best])


def hier_attention_rescoring(decoder_params, cfg: DecoderConfig,
                             nbest: List[Tuple[Tuple[int, ...], float]],
                             taps, encoder_len: int,
                             sos: int, eos: int, ignore_id: int,
                             ctc_weight: float = 0.5,
                             reverse_weight: float = 0.0
                             ) -> Tuple[List[int], float]:
    """Attention rescoring with the hier net's three decoders.

    The hier AED net trains `decoder`/`decoder_1`/`decoder_2` against
    the final/h6/h12 tap memories with equal loss weight
    (conformer_aed_fmoe_localComm_catEmbed_domain_acc_hier.py:49-70,
    all three CE terms summed unweighted in the trainer). Rescoring
    accordingly averages the three decoders' hypothesis scores, each
    decoder attending its own tap. The reference never shipped any
    rescoring (its impl is commented out, ctc_aed.py:160-252); this is
    the natural extension of that sketch to the hier heads.

    taps: (h6, h12, h_final) each (1, T', d) for one utterance — the
    engine's return_taps output order.
    decoder_params: {"decoder": tree [, "decoder_1", "decoder_2"]}.
    """
    hyps = [list(h) for h, _ in nbest]
    ctc_scores = np.array([s for _, s in nbest])
    mlens = jnp.asarray([encoder_len], jnp.int32)
    h6, h12, h_final = taps
    memory_of = {"decoder": h_final, "decoder_1": h6, "decoder_2": h12}

    def one(p, memory):
        left = p.get("left_decoder", p)
        att = score_hyps(left, cfg, memory, mlens, hyps, sos, eos,
                         ignore_id)
        if reverse_weight > 0.0 and "right_decoder" in p:
            r = score_hyps(p["right_decoder"], cfg, memory, mlens, hyps,
                           sos, eos, ignore_id, reverse=True)
            att = (1.0 - reverse_weight) * att + reverse_weight * r
        return att

    scores = [one(decoder_params[name], memory_of[name])
              for name in ("decoder", "decoder_1", "decoder_2")
              if name in decoder_params]
    att = np.mean(scores, axis=0)
    total = att + ctc_weight * ctc_scores
    best = int(np.argmax(total))
    return hyps[best], float(total[best])


def attention_beam_search(p, cfg: DecoderConfig, memory: jax.Array,
                          memory_lens: jax.Array, beam_size: int,
                          max_len: int, sos: int, eos: int):
    """Batched AED beam search over encoder memories — the standalone
    attention decode mode (the WeNet-style `recognize()` the reference's
    finish-mask utilities exist for, utils/mask.py:205-251). One jitted
    lax.scan of `forward_one_step` over a static-shape cache; beam
    reordering is a gather, finished hypotheses ride along under
    mask_finished_scores/preds.

    memory: (B, T, d); returns (hyps (B, beam, max_len) int32 — eos
    padded, sorted best-first — and scores (B, beam))."""
    from m3asr_tpu.ops.masking import (mask_finished_preds,
                                       mask_finished_scores)

    B, _, d = memory.shape
    N = B * beam_size
    mem = jnp.repeat(memory, beam_size, axis=0)              # (N, T, d)
    mlens = jnp.repeat(memory_lens, beam_size, axis=0)
    cache = init_cache(cfg, N, max_len, d, memory.dtype)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    # only beam 0 is alive at step 0 (all beams start identical at sos)
    scores = jnp.tile(jnp.where(jnp.arange(beam_size) == 0, 0.0, neg_inf),
                      (B, 1))                                # (B, beam)
    hyps = jnp.full((N, max_len), eos, jnp.int32)
    end_flag = jnp.zeros((N, 1), bool)
    tokens = jnp.full((N,), sos, jnp.int32)

    def step(carry, pos):
        tokens, scores, hyps, cache, end_flag = carry
        logp, cache = forward_one_step(p, cfg, mem, mlens, tokens, pos,
                                       cache)                # (N, V)
        top_logp, top_idx = jax.lax.top_k(logp.astype(jnp.float32),
                                          beam_size)         # (N, beam)
        top_logp = mask_finished_scores(top_logp, end_flag)
        top_idx = mask_finished_preds(top_idx, end_flag, eos)
        cand = (scores.reshape(N, 1) + top_logp).reshape(B,
                                                         beam_size * beam_size)
        scores, offset = jax.lax.top_k(cand, beam_size)      # (B, beam)
        parent = offset // beam_size                         # beam index
        parent_glob = (jnp.arange(B)[:, None] * beam_size +
                       parent).reshape(N)
        best_pred = jnp.take_along_axis(
            top_idx.reshape(B, beam_size * beam_size), offset,
            axis=1).reshape(N)
        # reorder per-beam state to the surviving parents
        hyps = hyps[parent_glob]
        cache = cache[:, parent_glob]
        end_flag = end_flag[parent_glob]
        hyps = hyps.at[:, pos].set(best_pred)
        end_flag = end_flag | (best_pred == eos)[:, None]
        return (best_pred, scores, hyps, cache, end_flag), None

    (_, scores, hyps, _, _), _ = jax.lax.scan(
        step, (tokens, scores, hyps, cache, end_flag),
        jnp.arange(max_len))
    return hyps.reshape(B, beam_size, max_len), scores


_BEAM_SEARCH_JIT = {}


def attention_search_decode(p, cfg: DecoderConfig, memory, memory_lens,
                            beam_size: int, sos: int, eos: int,
                            max_len: int = 0) -> List[List[int]]:
    """Host wrapper: run attention_beam_search and cut each best
    hypothesis at its first eos. max_len defaults to the memory length
    (one token per encoder frame is a safe AED bound)."""
    memory = jnp.asarray(memory)
    memory_lens = jnp.asarray(memory_lens, jnp.int32)
    if max_len <= 0:
        max_len = int(memory.shape[1])
    key = (cfg.attention_heads, cfg.num_blocks, cfg.linear_units,
           beam_size, max_len, sos, eos)
    fn = _BEAM_SEARCH_JIT.get(key)
    if fn is None:
        fn = jax.jit(lambda p, m, ml: attention_beam_search(
            p, cfg, m, ml, beam_size, max_len, sos, eos))
        _BEAM_SEARCH_JIT[key] = fn
    hyps, _ = fn(p, memory, memory_lens)
    hyps = np.asarray(hyps)
    out = []
    for b in range(hyps.shape[0]):
        best = hyps[b, 0]
        toks = []
        for t in best:
            if int(t) == eos:
                break
            toks.append(int(t))
        out.append(toks)
    return out


def init(key, cfg: DecoderConfig, vocab_size: int, d_model: int,
         dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_blocks + 2)
    p = {
        "embed": {"weight": jax.random.normal(ks[0], (vocab_size, d_model),
                                              dtype)},
        "pos_enc": {"pe": positional.sinusoid_table(d_model, dtype=dtype)},
        "after_norm": init_layer_norm(d_model, dtype),
        "output_layer": init_linear(ks[1], d_model, vocab_size, dtype=dtype),
    }
    from m3asr_tpu.ops.attention import init_mha

    def one_layer(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "norm1": init_layer_norm(d_model, dtype),
            "norm2": init_layer_norm(d_model, dtype),
            "norm3": init_layer_norm(d_model, dtype),
            "self_attn": init_mha(k1, d_model, dtype),
            "src_attn": init_mha(k2, d_model, dtype),
            "feed_forward": {
                "w_1": init_linear(k3, d_model, cfg.linear_units,
                                   dtype=dtype),
                "w_2": init_linear(k4, cfg.linear_units, d_model,
                                   dtype=dtype)},
        }

    layers = [one_layer(k) for k in ks[2:]]
    p["decoders"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return p
