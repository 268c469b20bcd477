"""Training step for the MoE conformer (CTC objective).

The TPU-native successor of the reference trainers
(trainer_3m_fix/bk/train_conformer_aed_fmoe_localComm_bmuf_domain_acc_hier.py):
instead of DDP/BMUF process groups + fmoe_cuda all-to-alls, one jitted
step over a (dp, ep) mesh — gradients psum over 'dp', expert weights
and compute sharded over 'ep', all inserted by GSPMD from sharding
annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from m3asr_tpu.config import ModelConfig, MOE_HIER_PROTOS
from m3asr_tpu.models import conformer, moe_conformer
from m3asr_tpu.train import losses


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    warmup_steps: int = 25000
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    ctc_weight: float = 1.0
    loss_type: str = "ctc"            # 'ctc' | 'ce' — the reference's
                                      # cectc recipe selects CE by the
                                      # loader mode (train_cectc_ddp.py
                                      # LossCompute loss_type='ce':
                                      # frame-level CE on alignment
                                      # labels instead of CTC)
    padding_idx: int = -1             # ignored frame label in CE mode
    embed_ctc_weight: float = 0.0     # aux CTC on the embed encoder head
    router_l1_weight: float = 0.0
    router_importance_weight: float = 0.0
    blank_idx: int = 0
    remat: bool = False            # per-block rematerialization
    ce_weight: float = 1e-5        # domain/acc head CE weight
                                   # (reference cfg default,
                                   # bk/..._hier.py:378)
    attn_impl: str = "xla"         # 'flash' = Pallas flash attention
                                   # fwd+bwd (custom VJP; chunk masks
                                   # ride the window encoding)
    compute_dtype: str = "float32"  # 'bfloat16' = mixed precision:
                                    # fwd/bwd matmuls in bf16 on the
                                    # MXU, f32 master params/optimizer/
                                    # loss (the reference trains pure
                                    # fp32 — this is the TPU-standard
                                    # speedup it never had)
    spec_aug: bool = False         # on-device SpecAugment inside the
                                   # jitted step (ops/masking.
                                   # spec_augment) — replaces the
                                   # loader-side numpy masks; time warp
                                   # (if wanted) stays in the loader
    spec_aug_conf: Optional[dict] = None  # num_t_mask/num_f_mask/
                                          # max_t/max_f overrides
    accum_steps: int = 1           # gradient accumulation: split each
                                   # batch into accum_steps microbatches
                                   # scanned sequentially (lax.scan, so
                                   # activation memory is one microbatch)
                                   # and average the grads before ONE
                                   # optimizer update — large effective
                                   # batches on few chips (the reference
                                   # has no equivalent; it scales batch
                                   # by adding GPUs)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """WarmupNoam schedule + Adam via the lr_scheduler factory (the
    reference's build_optimizer, utils/lr_scheduler.py:306-314), with
    the runtime lr_scale knob divergence recovery halves."""
    from m3asr_tpu.train.lr_scheduler import build_optimizer
    return build_optimizer(
        "warmup_noam", {"warmup_steps": cfg.warmup_steps},
        cfg.learning_rate, optim_type="adam",
        max_grad_norm=cfg.grad_clip, weight_decay=cfg.weight_decay)


def train_chunk_mask(enc_cfg, feat, feat_len, rng):
    """The per-batch chunk mask of the reference training forward
    (conformer_fmoe_localComm_catEmbed.py:225-231: add_optional_chunk_mask
    with decoding_chunk_size=0 -> random dynamic chunks when
    use_dynamic_chunk, else the static chunk mask). Returns None when
    neither chunk mode is configured."""
    from m3asr_tpu.ops import masking

    if not (enc_cfg.use_dynamic_chunk or enc_cfg.static_chunk_size > 0):
        return None
    sub_len = masking.SUBSAMPLED_LENGTH[enc_cfg.input_layer]
    t_sub = int(sub_len(feat.shape[1]))          # static (bucketed) T'
    return masking.add_optional_chunk_mask(
        sub_len(feat_len), t_sub, enc_cfg.use_dynamic_chunk,
        enc_cfg.use_dynamic_left_chunk, 0, enc_cfg.static_chunk_size, -1,
        key=rng)


def _cast_compute(params, feat, tcfg):
    """Mixed-precision entry: bf16 copies of the float params + input
    for the forward/backward compute; gradients flow back through the
    casts and accumulate into the f32 master params (the jnp.astype
    VJP is a cast back to f32)."""
    if tcfg.compute_dtype != "bfloat16":
        return params, feat
    cast = lambda x: (x.astype(jnp.bfloat16)
                      if x is not None and jnp.issubdtype(
                          jnp.asarray(x).dtype, jnp.floating) else x)
    return jax.tree.map(cast, params), feat.astype(jnp.bfloat16)


def _loss_dtype(out):
    """Loss math stays f32 regardless of compute dtype."""
    return out.astype(jnp.float32)


def _apply_spec_aug(tcfg, rng, feat, feat_len):
    """On-device SpecAugment (consumes one rng split when enabled)."""
    if not tcfg.spec_aug:
        return rng, feat
    if rng is None:
        raise ValueError("spec_aug=True needs the per-batch step rng")
    from m3asr_tpu.ops import masking
    rng, rng_aug = jax.random.split(rng)
    return rng, masking.spec_augment(rng_aug, feat, feat_len,
                                     **(tcfg.spec_aug_conf or {}))


def loss_fn(params, model_cfg: ModelConfig, tcfg: TrainConfig,
            feat, feat_len, targets, target_lens, rng=None,
            domain_targets=None, acc_targets=None):
    is_moe = model_cfg.nnet_proto in MOE_HIER_PROTOS
    is_dfsmn = "dfsmn" in model_cfg.nnet_proto
    metrics = {}
    out_pool = out_pool_acc = None
    params, feat = _cast_compute(params, feat, tcfg)
    rng, feat = _apply_spec_aug(tcfg, rng, feat, feat_len)
    rng_main, rng_embed = (jax.random.split(rng) if rng is not None
                           else (None, None))
    if is_dfsmn:
        # DFSMN family (trainable from scratch, reference
        # dfsmn_san_res.py / dfsmn_san_fmoe_localComm_catEmbed.py):
        # no subsampling — frame-rate logits (the cectc recipes
        # frame-align CE on them); the MoE variant's embed sub-net
        # logits feed embed_ctc_weight like the conformer's
        from m3asr_tpu.models import dfsmn as dfsmn_mod
        from m3asr_tpu.models import registry as reg
        e = reg.dfsmn_enc_conf(model_cfg)
        if "fmoe" in model_cfg.nnet_proto:
            out, embed_out, out_len = dfsmn_mod.dfsmn_san_moe_forward(
                params, reg.dfsmn_moe_config(e), feat, feat_len,
                moe_impl="dense", attn_impl=tcfg.attn_impl)
        else:
            fwd = reg.get_family(model_cfg.nnet_proto).forward
            if (model_cfg.nnet_proto == "dfsmn_san_res_embed_domain_acc"
                    and (domain_targets is not None
                         or acc_targets is not None)):
                # in-model pooled heads
                # (dfsmn_san_res_embed_domain_acc.py:256-279)
                out, out_len, out_pool, out_pool_acc = fwd(
                    params, model_cfg, feat, feat_len, domain_acc=True,
                    attn_impl=tcfg.attn_impl)
            else:
                out, out_len = fwd(params, model_cfg, feat, feat_len,
                                   attn_impl=tcfg.attn_impl)
            embed_out = None
    elif is_moe:
        chunk_mask = train_chunk_mask(model_cfg.encoder_conf, feat,
                                      feat_len, rng_main)
        embed_mask = train_chunk_mask(model_cfg.encoder_conf.embed_conf,
                                      feat, feat_len, rng_embed)
        out, out_len, embed_out = moe_conformer.forward(
            params, model_cfg.encoder_conf, feat, feat_len,
            output_embed=True, moe_impl="dense", chunk_mask=chunk_mask,
            embed_chunk_mask=embed_mask, remat=tcfg.remat,
            attn_impl=tcfg.attn_impl)
    else:
        chunk_mask = train_chunk_mask(model_cfg.encoder_conf, feat,
                                      feat_len, rng_main)
        out, out_len = conformer.forward(params, model_cfg.encoder_conf,
                                         feat, feat_len,
                                         chunk_mask=chunk_mask,
                                         attn_impl=tcfg.attn_impl)
        embed_out = None
    out = _loss_dtype(out)
    if embed_out is not None:
        embed_out = _loss_dtype(embed_out)
    if out_pool is not None:
        out_pool = _loss_dtype(out_pool)
        out_pool_acc = _loss_dtype(out_pool_acc)
    if tcfg.loss_type == "ce":
        # frame-level CE on alignment labels (the cectc recipe,
        # bk/train_cectc_ddp.py LossCompute loss_type='ce'); labels
        # beyond each utterance's length are masked to padding_idx.
        # The label matrix is padded only to the batch's max label
        # length, which under bucket padding is shorter than the
        # model's padded output — pad it up before masking.
        T_out = out.shape[1]
        U = targets.shape[1]
        tgt = (jnp.pad(targets, ((0, 0), (0, T_out - U)),
                       constant_values=tcfg.padding_idx) if U < T_out
               else targets[:, :T_out])
        valid = jnp.arange(T_out)[None, :] < target_lens[:, None]
        tgt = jnp.where(valid, tgt, tcfg.padding_idx)
        loss, (_, likely, hit), (frames, _, _) = losses.ce_loss(
            out, tgt, tcfg.padding_idx, mean_in_frames=True)
        metrics["ce_loss"] = loss
        metrics["likely"] = likely / jnp.maximum(frames, 1)
        metrics["acc"] = hit / jnp.maximum(frames, 1)
    else:
        loss = tcfg.ctc_weight * losses.ctc_loss(
            out, out_len, targets, target_lens, tcfg.blank_idx)
        metrics["ctc_loss"] = loss
    if embed_out is not None and tcfg.embed_ctc_weight > 0:
        e_loss = losses.ctc_loss(embed_out, out_len, targets, target_lens,
                                 tcfg.blank_idx)
        metrics["embed_ctc_loss"] = e_loss
        loss = loss + tcfg.embed_ctc_weight * e_loss
    # per-utterance domain/accent CE on the in-model pooled heads
    # (dfsmn_san_res_embed_domain_acc proto; same loss shape as the
    # hier recipe's heads: CE sum / batch, ce_weight, hit-rate metric)
    B = feat.shape[0]
    for tag, logits, tgt in (("domain", out_pool, domain_targets),
                             ("acc", out_pool_acc, acc_targets)):
        if logits is None or tgt is None:
            continue
        ce_sum, (_, _, hit), (frames, _, _) = losses.ce_loss(
            logits, tgt[:, None], -1, mean_in_frames=False)
        ce = ce_sum / B
        metrics[f"{tag}_loss"] = ce
        metrics[f"{tag}_hit"] = hit / jnp.maximum(frames, 1)
        loss = loss + tcfg.ce_weight * ce
    metrics["loss"] = loss
    return loss, metrics


def _accum_value_and_grad(per_mb_loss, params, mb_arrays, rng,
                          accum_steps: int):
    """Gradient accumulation over `accum_steps` equal microbatches.

    per_mb_loss(params, mb_tuple, rng) -> (loss, metrics); mb_arrays is
    a tuple of batch-leading arrays (entries may be None), batch size
    must divide accum_steps. Microbatches run sequentially under
    lax.scan — peak activation memory is one microbatch — and the
    returned ((loss, metrics), grads) are microbatch means, which for
    batch-mean losses (e.g. ctc_loss) equals the full-batch value.
    """
    B = next(a.shape[0] for a in mb_arrays if a is not None)
    if B % accum_steps != 0:
        raise ValueError(f"batch {B} not divisible by accum_steps "
                         f"{accum_steps}")
    present = [a is not None for a in mb_arrays]
    xs = tuple(a.reshape((accum_steps, B // accum_steps) + a.shape[1:])
               for a in mb_arrays if a is not None)
    rngs = jax.random.split(rng, accum_steps) if rng is not None else None
    if rngs is not None:
        xs = xs + (rngs,)
    gfun = jax.value_and_grad(per_mb_loss, has_aux=True)

    def slot(x):
        it = iter(x)
        mb = tuple(next(it) if p else None for p in present)
        r = next(it) if rngs is not None else None
        return mb, r

    def body(carry, x):
        mb, r = slot(x)
        (loss, metrics), g = gfun(params, mb, r)
        (l_acc, m_acc, g_acc) = carry
        return (l_acc + loss,
                jax.tree.map(lambda a, b: a + b, m_acc, metrics),
                jax.tree.map(lambda a, b: a + b, g_acc, g)), None

    mb0, r0 = slot(tuple(x[0] for x in xs))
    shapes = jax.eval_shape(gfun, params, mb0, r0)
    (l_s, m_s), g_s = shapes
    zeros = lambda s: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), s)
    carry0 = (zeros(l_s), zeros(m_s), zeros(g_s))
    (loss, metrics, grads), _ = jax.lax.scan(body, carry0, xs)
    inv = 1.0 / accum_steps
    scale = lambda t: jax.tree.map(lambda a: a * inv, t)
    return (scale(loss), scale(metrics)), scale(grads)


def add_sos_eos_jnp(targets: jax.Array, target_lens: jax.Array, sos: int,
                    eos: int, ignore_id: int):
    """jit-able add_sos_eos: (B, U) -> ys_in/ys_out (B, U+1)."""
    B, U = targets.shape
    pos = jnp.arange(U + 1)[None, :]
    valid_in = pos <= target_lens[:, None]
    shifted = jnp.pad(targets, ((0, 0), (1, 0)))
    ys_in = jnp.where(pos == 0, sos, jnp.where(valid_in, shifted, ignore_id))
    padded = jnp.pad(targets, ((0, 0), (0, 1)))
    at_eos = pos == target_lens[:, None]
    valid_out = pos < target_lens[:, None]
    ys_out = jnp.where(at_eos, eos, jnp.where(valid_out, padded, ignore_id))
    return ys_in, ys_out


def init_domain_acc_heads(key, d_model: int, output_dim_domain: int = 6,
                          output_dim_acc: int = 8, bottleneck: int = 4,
                          dtype=jnp.float32):
    """The domain/accent classifier heads the reference sketches on the
    embed encoder but left commented out
    (conformer_embed_domain_acc.py:144-147: Linear(d->4) bottleneck then
    Linear(4->output_dim_{domain,acc}); default dims 6/8 from
    conformer_fmoe_...domain_acc.py:91-92). Functional here: per-frame
    logits over the embed hidden, trained with the commented recipe of
    bk/..._hier.py:100-139."""
    from m3asr_tpu.ops.common import init_linear
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "domain_head": {"embed": init_linear(k1, d_model, bottleneck,
                                             dtype=dtype),
                        "out": init_linear(k2, bottleneck,
                                           output_dim_domain, dtype=dtype)},
        "acc_head": {"embed": init_linear(k3, d_model, bottleneck,
                                          dtype=dtype),
                     "out": init_linear(k4, bottleneck, output_dim_acc,
                                        dtype=dtype)},
    }


def hier_aed_loss_fn(params, model_cfg: ModelConfig, tcfg: "HierTrainConfig",
                     feat, feat_len, targets, target_lens,
                     aed_targets, aed_target_lens, rng=None,
                     domain_targets=None, acc_targets=None):
    """The deployed training recipe (bk/..._hier.py:52-154 LossCompute):
    CTC(final) + embed-CTC + label-smoothing AED at taps 6/12/final
    + router l1+importance aux. params must include 'decoder',
    'decoder_1', 'decoder_2' subtrees (AED wrapper layout)."""
    from m3asr_tpu.models import aed

    params, feat = _cast_compute(params, feat, tcfg)
    rng, feat = _apply_spec_aug(tcfg, rng, feat, feat_len)
    enc = params["encoder"] if "encoder" in params else params
    rng_main, rng_embed = (jax.random.split(rng) if rng is not None
                           else (None, None))
    chunk_mask = train_chunk_mask(model_cfg.encoder_conf, feat, feat_len,
                                  rng_main)
    embed_mask = train_chunk_mask(model_cfg.encoder_conf.embed_conf,
                                  feat, feat_len, rng_embed)
    with_heads = domain_targets is not None or acc_targets is not None
    res = moe_conformer.forward(enc, model_cfg.encoder_conf, feat,
                                feat_len, output_embed=True,
                                hier_taps=True, return_router_probs=True,
                                moe_impl="dense", chunk_mask=chunk_mask,
                                embed_chunk_mask=embed_mask,
                                return_embed_hidden=with_heads,
                                attn_impl=tcfg.attn_impl)
    out, out_len, embed_out, h6, h12, h_final, router_ps = res[:7]
    embed_hidden = res[7] if with_heads else None
    out = _loss_dtype(out)
    embed_out = _loss_dtype(embed_out)
    router_ps = _loss_dtype(router_ps)
    metrics = {}
    ctc = losses.ctc_loss(out, out_len, targets, target_lens,
                          tcfg.blank_idx)
    metrics["ctc_loss"] = ctc
    loss = tcfg.ctc_weight * ctc

    # AED branch: final decoder at weight 1, tap decoders down-weighted
    # by tap_weight, all scaled by (1 - ctc_weight)
    # (bk/..._hier.py:64-89)
    sos = eos = model_cfg.output_dim - 1
    ys_in, ys_out = add_sos_eos_jnp(aed_targets, aed_target_lens, sos, eos,
                                    -1)
    ys_in = jnp.where(ys_in < 0, 0, ys_in)
    ys_in_lens = aed_target_lens + 1
    aed_total = 0.0
    for i, (dec_name, memory) in enumerate(
            [("decoder", h_final), ("decoder_1", h6), ("decoder_2", h12)]):
        if dec_name not in params:
            continue
        dp = params[dec_name]
        dp = dp.get("left_decoder", dp)
        dec_out = aed.forward(dp, model_cfg.decoder_conf, memory, out_len,
                              ys_in, ys_in_lens)
        a_loss = losses.label_smoothing_loss(_loss_dtype(dec_out), ys_out,
                                             -1, tcfg.lsm_weight)
        metrics[f"aed_loss_{i}"] = a_loss
        aed_total = aed_total + (a_loss if i == 0
                                 else tcfg.tap_weight * a_loss)
    loss = loss + (1.0 - tcfg.ctc_weight) * aed_total

    # the reference scales the CTC+AED sum by 1e-4 BEFORE adding the
    # embed and aux terms (bk/..._hier.py:87-99)
    loss = loss * tcfg.loss_scale

    if tcfg.embed_ctc_weight > 0:
        e_loss = losses.ctc_loss(embed_out, out_len, targets, target_lens,
                                 tcfg.blank_idx)
        metrics["embed_ctc_loss"] = e_loss
        loss = loss + tcfg.embed_ctc_weight * e_loss

    # domain/accent CE on the embed hidden (the reference sketches
    # these heads but leaves them commented — loader format is ONE
    # class id per utterance, loader/ctc_aed_loader_domain_acc.py:149;
    # loss shape per the commented recipe bk/..._hier.py:100-139: CE
    # sum / batch, weighted ce_weight, hit-rate metric. The pooling to
    # utterance level is unspecified in the dead code; masked mean
    # over valid frames is used here.)
    from m3asr_tpu.ops.common import linear as _linear
    B = feat.shape[0]
    for tag, head_name, tgt in (("domain", "domain_head", domain_targets),
                                ("acc", "acc_head", acc_targets)):
        if tgt is None or head_name not in params:
            continue
        head = params[head_name]
        T_out = embed_hidden.shape[1]
        valid = (jnp.arange(T_out)[None, :] <
                 out_len[:, None]).astype(embed_hidden.dtype)
        pooled = ((embed_hidden * valid[:, :, None]).sum(1)
                  / jnp.maximum(valid.sum(1), 1.0)[:, None])   # (B, d)
        logits = _loss_dtype(
            _linear(head["out"], _linear(head["embed"], pooled)))
        ce_sum, (_, _, hit), (frames, _, _) = losses.ce_loss(
            logits[:, None, :], tgt[:, None], -1, mean_in_frames=False)
        ce = ce_sum / B
        metrics[f"{tag}_loss"] = ce
        metrics[f"{tag}_hit"] = hit / jnp.maximum(frames, 1)
        loss = loss + tcfg.ce_weight * ce

    if tcfg.router_l1_weight > 0 or tcfg.router_importance_weight > 0:
        # router_ps: (L, B, T, E)
        l1 = jnp.mean(jax.vmap(
            lambda p: losses.router_l1_loss(p, out_len))(router_ps))
        imp = jnp.mean(jax.vmap(
            lambda p: losses.router_importance_loss(p, out_len))(router_ps))
        metrics["router_l1"] = l1
        metrics["router_importance"] = imp
        loss = loss + tcfg.router_l1_weight * l1 + \
            tcfg.router_importance_weight * imp

    metrics["loss"] = loss
    return loss, metrics


@dataclasses.dataclass
class HierTrainConfig(TrainConfig):
    """Weights of the deployed hier recipe (bk/..._hier.py:52-154):

        loss = [ctc_w*CTC + (1-ctc_w)*(AED + 0.1*AED_6 + 0.1*AED_12)]
               * loss_scale + embed_ctc_weight*CTC(embed) + router aux

    tap AED losses are down-weighted by `tap_weight`; the CTC+AED sum
    is globally scaled by `loss_scale` (the reference's literal 1e-4,
    applied BEFORE the embed and aux terms) — set loss_scale=1.0 for a
    conventionally-scaled loss."""
    ctc_weight: float = 0.7
    lsm_weight: float = 0.1
    tap_weight: float = 0.1
    loss_scale: float = 1e-4
    embed_ctc_weight: float = 0.3
    router_l1_weight: float = 0.0
    router_importance_weight: float = 0.0
    # ce_weight (domain/acc head CE) inherited from TrainConfig


def _needs_rng(model_cfg: ModelConfig,
               tcfg: Optional[TrainConfig] = None) -> bool:
    if tcfg is not None and tcfg.spec_aug:
        return True
    enc = model_cfg.encoder_conf
    embed = getattr(enc, "embed_conf", None)
    # DFSMN configs carry embed_conf as a raw dict — treat any
    # non-attribute form as "no dynamic chunk"
    return enc.use_dynamic_chunk or bool(getattr(embed,
                                                 "use_dynamic_chunk", False))


def make_hier_train_step(model_cfg: ModelConfig, tcfg: HierTrainConfig,
                         optimizer: optax.GradientTransformation,
                         with_domain_acc: bool = False):
    """Full hier AED training step (the deployed recipe). When the
    encoder config enables dynamic-chunk training, the returned step
    takes a trailing PRNG key (the per-batch chunk-size sample). With
    with_domain_acc, the step takes frame-level domain/acc label
    matrices after the AED labels and trains the bottleneck classifier
    heads (init_domain_acc_heads) on the embed hidden."""

    def _run(params, opt_state, feat, feat_len, targets, target_lens,
             aed_targets, aed_target_lens, rng, domain_targets,
             acc_targets):
        if tcfg.accum_steps > 1:
            def per_mb(p, mb, r):
                (f, fl, tg, tl, at, atl, dt, ac) = mb
                return hier_aed_loss_fn(p, model_cfg, tcfg, f, fl, tg, tl,
                                        at, atl, rng=r, domain_targets=dt,
                                        acc_targets=ac)
            (loss, metrics), grads = _accum_value_and_grad(
                per_mb, params,
                (feat, feat_len, targets, target_lens, aed_targets,
                 aed_target_lens, domain_targets, acc_targets),
                rng, tcfg.accum_steps)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: hier_aed_loss_fn(
                    p, model_cfg, tcfg, feat, feat_len,
                    targets, target_lens, aed_targets,
                    aed_target_lens, rng=rng,
                    domain_targets=domain_targets,
                    acc_targets=acc_targets),
                has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if with_domain_acc:
        # positional signature matches the Trainer's batch_keys order
        # (..., domain, acc[, rng])
        def step(params, opt_state, feat, feat_len, targets, target_lens,
                 aed_targets, aed_target_lens, domain_targets,
                 acc_targets, rng=None):
            return _run(params, opt_state, feat, feat_len, targets,
                        target_lens, aed_targets, aed_target_lens, rng,
                        domain_targets, acc_targets)
    else:
        def step(params, opt_state, feat, feat_len, targets, target_lens,
                 aed_targets, aed_target_lens, rng=None):
            return _run(params, opt_state, feat, feat_len, targets,
                        target_lens, aed_targets, aed_target_lens, rng,
                        None, None)

    return step


def make_train_step(model_cfg: ModelConfig, tcfg: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    with_domain_acc: bool = False):
    """Returns step(params, opt_state, batch) -> (params, opt_state,
    metrics). jit/shard externally (see parallel.mesh +
    __graft_entry__.dryrun_multichip). With dynamic-chunk training
    enabled, step takes a trailing PRNG key. With with_domain_acc the
    step takes per-utterance domain/acc id vectors after the CTC labels
    and trains the dfsmn_san_res_embed_domain_acc in-model heads."""

    def _run(params, opt_state, feat, feat_len, targets, target_lens,
             rng, domain_targets, acc_targets):
        if tcfg.accum_steps > 1:
            def per_mb(p, mb, r):
                (f, fl, tg, tl, dt, ac) = mb
                return loss_fn(p, model_cfg, tcfg, f, fl, tg, tl, rng=r,
                               domain_targets=dt, acc_targets=ac)
            (loss, metrics), grads = _accum_value_and_grad(
                per_mb, params,
                (feat, feat_len, targets, target_lens, domain_targets,
                 acc_targets), rng, tcfg.accum_steps)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, model_cfg, tcfg, feat, feat_len,
                                  targets, target_lens, rng=rng,
                                  domain_targets=domain_targets,
                                  acc_targets=acc_targets),
                has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if with_domain_acc:
        def step(params, opt_state, feat, feat_len, targets, target_lens,
                 domain_targets, acc_targets, rng=None):
            return _run(params, opt_state, feat, feat_len, targets,
                        target_lens, rng, domain_targets, acc_targets)
    else:
        def step(params, opt_state, feat, feat_len, targets, target_lens,
                 rng=None):
            return _run(params, opt_state, feat, feat_len, targets,
                        target_lens, rng, None, None)

    return step
