"""Length / padding mask utilities.

TPU-native replacements for the reference's mask machinery:

* make_pad_mask            — trainer_3m_fix/utils/mask.py:148-174
* masked_fill              — MaskedFillPluginDynamic
                             (plugin/masked_fill_plugin/masked_fill_kernel.cu:26-74)
* conv_subsampled_length   — MaskConv2dSamplePluginDynamic
                             (plugin/mask_conv2d_sample_plugin/mask_conv2d_sample_kernel.cu:25-50)
* subsequent_mask / chunk masks — utils/mask.py:7-145

All masks are computed from int32 lengths with broadcasted iota — no
boolean mask tensors cross the host/device boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at PADDED positions (matches utils/mask.py:148-174).
    lengths: int32 (B,). Returns bool (B, max_len)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def make_valid_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """True at VALID positions. (B, max_len)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def masked_fill(x: jax.Array, lengths: jax.Array, fill: float = 0.0,
                time_axis: int = 1) -> jax.Array:
    """Fill positions >= length with `fill` along `time_axis`.
    x: (B, ..., T, ...) with batch at axis 0."""
    T = x.shape[time_axis]
    valid = make_valid_mask(lengths, T)  # (B, T)
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[time_axis] = T
    valid = valid.reshape(shape)
    return jnp.where(valid, x, jnp.asarray(fill, x.dtype))


def conv_subsampled_length(lengths: jax.Array, left_padding: int = 2,
                           stride: int = 2) -> jax.Array:
    """Output length after a valid strided conv:
    out = (len - left_padding - 1) // stride + 1
    (mask_conv2d_sample_kernel.cu:25-50; applied twice for
    Conv2dSubsampling4)."""
    return (lengths - left_padding - 1) // stride + 1


def subsampling4_length(lengths: jax.Array) -> jax.Array:
    """Length arithmetic of Conv2dSubsampling4 (two k=3 s=2 convs)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    return conv_subsampled_length(l1, 2, 2)


def subsampling6_length(lengths: jax.Array) -> jax.Array:
    """Conv2dSubsampling6: k=3 s=2 then k=5 s=3 (subsampling.py:148-188)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    return conv_subsampled_length(l1, 4, 3)


def subsampling8_length(lengths: jax.Array) -> jax.Array:
    """Conv2dSubsampling8: three k=3 s=2 convs (subsampling.py:189-232)."""
    l1 = conv_subsampled_length(lengths, 2, 2)
    l2 = conv_subsampled_length(l1, 2, 2)
    return conv_subsampled_length(l2, 2, 2)


# length arithmetic per frontend input_layer (works on traced arrays
# and python ints alike — pure // arithmetic)
SUBSAMPLED_LENGTH = {
    "conv2d": subsampling4_length,
    "conv2d6": subsampling6_length,
    "conv2d8": subsampling8_length,
    "linear": lambda lengths: lengths,
}


def subsequent_mask(size: int, dtype=jnp.bool_) -> jax.Array:
    """Lower-triangular causal mask, True where attention is allowed
    (utils/mask.py:7-39). (size, size)."""
    i = jnp.arange(size)
    return (i[None, :] <= i[:, None]).astype(dtype)


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jax.Array:
    """Chunked streaming mask (utils/mask.py:42-79). True = attend."""
    pos = jnp.arange(size)
    chunk = pos // chunk_size
    ending = jnp.minimum((chunk[:, None] + 1) * chunk_size, size)
    allowed = pos[None, :] < ending
    if num_left_chunks >= 0:
        start = jnp.maximum((chunk[:, None] - num_left_chunks) * chunk_size, 0)
        allowed = allowed & (pos[None, :] >= start)
    return allowed


def _chunk_mask_traced(size: int, chunk_size: jax.Array,
                       num_left_chunks: jax.Array) -> jax.Array:
    """subsequent_chunk_mask with *traced* chunk_size / num_left_chunks
    (needed because the dynamic-chunk training mode samples them per
    batch inside jit)."""
    pos = jnp.arange(size)
    chunk = pos // chunk_size
    ending = jnp.minimum((chunk[:, None] + 1) * chunk_size, size)
    allowed = pos[None, :] < ending
    start = jnp.maximum((chunk[:, None] - num_left_chunks) * chunk_size, 0)
    left_ok = jnp.where(num_left_chunks >= 0, pos[None, :] >= start, True)
    return allowed & left_ok


def dynamic_chunk_mask(key: jax.Array, size: int,
                       use_dynamic_left_chunk: bool = False) -> jax.Array:
    """Random dynamic-chunk *training* mask — the decoding_chunk_size==0
    branch of add_optional_chunk_mask (utils/mask.py:110-131): sample
    chunk_size uniform in [1, size); if it exceeds size//2 use full
    context, else fold to [1, 25] (1 s of audio after 4x subsampling);
    optionally sample the number of left chunks too. (size, size) bool.

    Deviation from the torch original: the left-chunk count is drawn as
    uniform-mod (the bound is traced, so a bounded randint can't be
    staged); the distribution over [0, max_left) is identical.
    """
    k1, k2 = jax.random.split(key)
    cs = jax.random.randint(k1, (), 1, max(size, 2))
    full = cs > size // 2
    cs = jnp.where(full, size, cs % 25 + 1)
    if use_dynamic_left_chunk:
        max_left = jnp.maximum((size - 1) // cs, 1)
        nleft = jax.random.randint(k2, (), 0, 2 ** 30) % max_left
        nleft = jnp.where(full, -1, nleft)
    else:
        nleft = jnp.int32(-1)
    return _chunk_mask_traced(size, cs, nleft)


def add_optional_chunk_mask(lengths: jax.Array, max_len: int,
                            use_dynamic_chunk: bool,
                            use_dynamic_left_chunk: bool,
                            decoding_chunk_size: int,
                            static_chunk_size: int,
                            num_decoding_left_chunks: int,
                            key=None):
    """The reference's add_optional_chunk_mask (utils/mask.py:80-145)
    as a functional jit-able op: returns a (B, 1, T, T) attend-mask
    combining the chunk pattern with key-side padding validity, or
    None when no chunking applies (length masking alone, which the
    attention ops already do from `lengths`).

    decoding_chunk_size: 0 = training (random dynamic chunk, requires
    `key`), <0 = full context, >0 = fixed decode chunk.
    """
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk = jnp.ones((max_len, max_len), bool)
        elif decoding_chunk_size > 0:
            chunk = subsequent_chunk_mask(max_len, decoding_chunk_size,
                                          num_decoding_left_chunks)
        else:
            assert key is not None, "training mode needs a PRNG key"
            chunk = dynamic_chunk_mask(key, max_len, use_dynamic_left_chunk)
    elif static_chunk_size > 0:
        chunk = subsequent_chunk_mask(max_len, static_chunk_size,
                                      num_decoding_left_chunks)
    else:
        return None
    valid = make_valid_mask(lengths, max_len)            # (B, T)
    return (chunk[None] & valid[:, None, :])[:, None]    # (B, 1, T, T)


def mask_finished_scores(score: jax.Array, flag: jax.Array) -> jax.Array:
    """Beam-search finish masking (utils/mask.py:205-232): for finished
    hypotheses keep exactly one alive branch — candidate 0 gets score 0,
    the rest -inf — so a finished hyp rides along unchanged while
    unfinished hyps expand normally.

    score: (N, beam) candidate scores; flag: (N, 1) bool finished."""
    beam = score.shape[-1]
    first = jnp.arange(beam)[None, :] == 0                 # (1, beam)
    neg_inf = jnp.asarray(-jnp.inf, score.dtype)
    score = jnp.where(flag & ~first, neg_inf, score)       # kill branches
    score = jnp.where(flag & first, jnp.zeros((), score.dtype), score)
    return score


def mask_finished_preds(pred: jax.Array, flag: jax.Array,
                        eos: int) -> jax.Array:
    """Beam-search finish masking (utils/mask.py:235-251): predictions
    of finished hypotheses all become eos.

    pred: (N, beam) int candidates; flag: (N, 1) bool finished."""
    return jnp.where(flag, jnp.asarray(eos, pred.dtype), pred)


def spec_augment(key: jax.Array, feat: jax.Array, feat_len: jax.Array,
                 num_t_mask: int = 2, num_f_mask: int = 2,
                 max_t: int = 50, max_f: int = 10) -> jax.Array:
    """On-device batched SpecAugment: `num_t_mask` time masks (width
    in [1, max_t), start within each utterance's valid length) and
    `num_f_mask` frequency masks (width in [1, max_f)), zero-filled —
    the mask semantics of the reference's loader-side numpy
    _spec_augmentation (loader/augment.py:32-77; time warp stays in
    the CPU loader — PIL bicubic has no cheap XLA analogue) as one
    fused elementwise op inside the jitted train step. TPU-first:
    augmentation rides the MXU-bound step instead of stealing loader
    CPU, and composes with jit/shard_map (per-batch key = determinism).

    feat: (B, T, D); feat_len: (B,). Returns the masked copy.
    """
    B, T, D = feat.shape
    kt_s, kt_l, kf_s, kf_l = jax.random.split(key, 4)
    # time masks: start in [0, len-1) like randint(0, max_frames - 1)
    u = jax.random.uniform(kt_s, (B, num_t_mask))
    hi = jnp.maximum(feat_len[:, None] - 1, 1)
    t_start = (u * hi).astype(jnp.int32)
    t_len = jax.random.randint(kt_l, (B, num_t_mask), 1, max(max_t, 2))
    t_end = jnp.minimum(t_start + t_len, feat_len[:, None])
    t_idx = jnp.arange(T)[None, :, None]
    t_hit = jnp.any((t_idx >= t_start[:, None, :]) &
                    (t_idx < t_end[:, None, :]), axis=-1)      # (B, T)
    # frequency masks
    f_start = jax.random.randint(kf_s, (B, num_f_mask), 0, max(D - 1, 1))
    f_len = jax.random.randint(kf_l, (B, num_f_mask), 1, max(max_f, 2))
    f_end = jnp.minimum(f_start + f_len, D)
    f_idx = jnp.arange(D)[None, :, None]
    f_hit = jnp.any((f_idx >= f_start[:, None, :]) &
                    (f_idx < f_end[:, None, :]), axis=-1)      # (B, D)
    keep = ~(t_hit[:, :, None] | f_hit[:, None, :])
    return feat * keep.astype(feat.dtype)
