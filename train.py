#!/usr/bin/env python3
"""Training CLI — TPU-native equivalent of the reference's trainer
entry points (trainer_3m_fix/bk/train_*.py:816-839: `python -m
torch.distributed.launch train_X.py --config yaml --tr_rspecifier ...`).

One jitted train step over a (dp, ep) device mesh replaces the
DDP/BMUF process groups; multi-host runs initialize via
parallel.distributed (torch.distributed-compatible env). The YAML
schema is the reference's: model_conf / loader_conf / collate_conf +
optimizer keys (lr, optim, optim_conf, schedule_type, schedule_conf,
max_grad_norm, weight_decay, name_nodecay).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(args):
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    import yaml
    import jax

    from m3asr_tpu.config import model_config_from_dict
    from m3asr_tpu.frontend.augment import CollateFunc
    from m3asr_tpu.io.loader import DataLoader
    from m3asr_tpu.models.registry import get_family
    from m3asr_tpu.parallel import distributed as dist
    from m3asr_tpu.parallel import mesh as pmesh
    from m3asr_tpu.train.lr_scheduler import build_optimizer
    from m3asr_tpu.train.step import (HierTrainConfig, TrainConfig,
                                      _needs_rng, loss_fn,
                                      make_hier_train_step, make_train_step)
    from m3asr_tpu.train.trainer import Trainer
    from m3asr_tpu.train.metrics import set_logger

    dist.initialize()

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    model_cfg = model_config_from_dict(raw)

    collate = CollateFunc(**(raw.get("collate_conf") or {}))
    loader_conf = dict(raw.get("loader_conf") or {})
    loader_conf.setdefault("drop_last", True)  # dp shards need full batches

    def make_tr_loader(skip):
        loader = DataLoader(args.tr_rspecifier, args.tr_labels,
                            training=True, loader_conf=loader_conf,
                            collate_func=collate,
                            aed_label_rspec=args.tr_aed_labels,
                            domain_rspec=args.tr_domain_labels,
                            acc_rspec=args.tr_acc_labels)
        return loader(skip_num=skip)

    cv_loader = None
    if args.cv_rspecifier:
        # validation must see every utterance (and isn't dp-sharded)
        cv_conf = dict(loader_conf, drop_last=False)

        def cv_loader():
            return DataLoader(args.cv_rspecifier, args.cv_labels,
                              loader_conf=cv_conf)()

    probe = DataLoader(args.tr_rspecifier, args.tr_labels,
                       loader_conf=loader_conf)
    model_cfg.input_dim = probe.input_dim

    family = get_family(model_cfg.nnet_proto)
    params = family.init(jax.random.PRNGKey(args.seed), model_cfg)

    # the deployed recipe: CTC + hier label-smoothing AED when AED
    # labels are given (bk/..._hier.py LossCompute)
    hier = bool(args.tr_aed_labels)
    if hier and "dfsmn" in model_cfg.nnet_proto:
        sys.exit("DFSMN protos carry no AED decoders (the reference's "
                 "DFSMN recipes are CTC/CE-trained) — drop --tr_aed_labels")
    tkw = dict(
        learning_rate=raw.get("lr", 1e-3),
        warmup_steps=(raw.get("schedule_conf") or {}).get("warmup_steps",
                                                          25000),
        grad_clip=raw.get("max_grad_norm", 5.0),
        weight_decay=raw.get("weight_decay", 0.0),
        embed_ctc_weight=raw.get("embed_ctc_weight", 0.0),
        # domain/acc head CE weight (the reference reads it from the
        # YAML, bk/..._hier.py:378)
        ce_weight=raw.get("ce_weight", 1e-5),
        # 'flash' = Pallas flash attention fwd+bwd (beyond the
        # reference; default stays xla until measured on chip)
        attn_impl=raw.get("attn_impl", "xla"),
        # 'bfloat16' = mixed-precision compute (f32 master weights)
        compute_dtype=raw.get("compute_dtype", "float32"),
        # gradient accumulation: batch_size must divide accum_steps;
        # microbatches scan sequentially before one optimizer update
        accum_steps=int(raw.get("accum_steps", 1)),
        # on-device SpecAugment inside the jitted step (collate_conf
        # spec_aug stays available for the loader-side numpy path)
        spec_aug=bool(raw.get("spec_aug_device", False)),
        spec_aug_conf=raw.get("spec_aug_device_conf"),
        # the cectc trainers pick CE vs CTC from the loader mode
        # (bk/train_cectc_ddp.py: loss_type = loader_conf['mode'])
        loss_type=loader_conf.get("mode", "ctc"))
    if hier:
        from m3asr_tpu.models import aed
        tcfg = HierTrainConfig(
            **tkw, ctc_weight=raw.get("ctc_weight", 0.7),
            tap_weight=raw.get("tap_weight", 0.1),
            loss_scale=raw.get("loss_scale", 1e-4),
            lsm_weight=raw.get("lsm_weight", 0.1))
        d_model = model_cfg.encoder_conf.attention_dim
        dkeys = jax.random.split(jax.random.PRNGKey(args.seed + 1), 3)
        params = {"encoder": params}
        for i, name in enumerate(("decoder", "decoder_1", "decoder_2")):
            params[name] = aed.init(dkeys[i], model_cfg.decoder_conf,
                                    model_cfg.output_dim, d_model)
    else:
        tcfg = TrainConfig(**tkw)
    # optional domain/accent classifier heads on the embed hidden
    # (must exist before the optimizer mask trees are built)
    if bool(args.tr_domain_labels) != bool(args.tr_acc_labels):
        sys.exit("--tr_domain_labels and --tr_acc_labels go together "
                 "(the domain_acc recipe carries both streams)")
    dfsmn_domain_acc = (model_cfg.nnet_proto
                        == "dfsmn_san_res_embed_domain_acc")
    if args.tr_domain_labels and not (hier or dfsmn_domain_acc):
        sys.exit("--tr_domain_labels/--tr_acc_labels require the hier "
                 "recipe (--tr_aed_labels) or the "
                 "dfsmn_san_res_embed_domain_acc proto (in-model "
                 "heads); without either the streams would be "
                 "silently ignored")
    domain_acc = bool(args.tr_domain_labels)
    if domain_acc and hier:
        # add-on classifier heads over the embed hidden (the DFSMN
        # domain_acc proto's heads live in the model itself)
        from m3asr_tpu.train.step import init_domain_acc_heads
        enc_conf = model_cfg.encoder_conf
        params.update(init_domain_acc_heads(
            jax.random.PRNGKey(args.seed + 2),
            enc_conf.embed_conf.attention_dim,
            enc_conf.output_dim_domain, enc_conf.output_dim_acc))
    optimizer = build_optimizer(
        raw.get("schedule_type", "warmup_noam"),
        raw.get("schedule_conf"), raw.get("lr", 1e-3),
        optim_type=raw.get("optim", "adam"),
        optim_conf=raw.get("optim_conf"),
        max_grad_norm=raw.get("max_grad_norm", 5.0),
        weight_decay=raw.get("weight_decay", 0.0),
        name_nodecay=raw.get("name_nodecay"), params=params)

    if args.smbr_cmd:
        # sequence-discriminative mode (bk/..._hier.py:560-595): the
        # external lattice command supplies d(loss)/d(logits)
        import shlex
        from m3asr_tpu.train.smbr import (KaldiLatticeBridge,
                                          run_smbr_training)
        if hier:
            sys.exit("--smbr_cmd trains on encoder posteriors; drop "
                     "--tr_aed_labels (the reference's sMBR recipe is "
                     "CTC-posterior based)")
        smbr_loader = DataLoader(
            args.tr_rspecifier, args.tr_labels, training=True,
            loader_conf=loader_conf, collate_func=collate,
            trans_file=args.tr_trans_file)

        def fwd(p, feat, feat_len):
            return family.forward(p, model_cfg, feat, feat_len)

        os.makedirs(args.output_dir, exist_ok=True)
        logger = set_logger("m3asr.smbr",
                            log_file=args.log_file or
                            os.path.join(args.output_dir, "train.log"))
        bridge = KaldiLatticeBridge(command=shlex.split(args.smbr_cmd))
        params, _, n = run_smbr_training(
            model_cfg, fwd, params, optimizer,
            make_loader=lambda: smbr_loader(output_keys=True),
            bridge=bridge, work_dir=args.output_dir,
            max_epochs=raw.get("max_epoch", args.max_epochs),
            logger=logger, log_period=raw.get("log_period", 100))
        print(f"smbr training done: {n} batches -> {args.output_dir}")
        return
    step = (make_hier_train_step(model_cfg, tcfg, optimizer,
                                 with_domain_acc=domain_acc) if hier
            else make_train_step(model_cfg, tcfg, optimizer,
                                 with_domain_acc=domain_acc))

    # mesh + shardings: dp x ep (the reference's dp_groups/mp_groups),
    # plus the beyond-reference axes --tp/--sp/--pp; dp must divide the
    # global batch, so cap it at gcd(batch, devices)
    import math
    n_dev = len(jax.devices())
    ep = args.ep if args.ep > 0 else 1
    tp, sp, pp = max(args.tp, 1), max(args.sp, 1), max(args.pp, 1)
    if (tp > 1 or sp > 1 or pp > 1) and args.bmuf:
        raise SystemExit("--bmuf composes with dp/ep only "
                         "(tp/sp/pp need the fused-step path)")
    if pp > 1 and hier:
        raise SystemExit("--pp supports the non-hier recipes (the hier "
                         "taps need every block's hidden on one stage)")
    is_dfsmn = "dfsmn" in model_cfg.nnet_proto
    if (tp > 1 or sp > 1 or pp > 1) and is_dfsmn:
        raise SystemExit("--tp/--sp/--pp cover the conformer families; "
                         "DFSMN protos train with dp/ep")
    if pp > 1 and "fmoe" not in model_cfg.nnet_proto:
        # only moe_conformer.forward consults the pipeline context; a
        # dense-conformer run would stage-shard the weights and then
        # scan anyway — strictly worse than --pp 1
        raise SystemExit("--pp supports the MoE conformer protos")
    if tp > 1 and tcfg.attn_impl == "flash":
        raise SystemExit("--tp with attn_impl=flash is unsupported: the "
                         "Pallas kernel has no SPMD rule for head-split "
                         "weights (use attn_impl=xla)")
    dp = math.gcd(loader_conf.get("batch_size", 1),
                  n_dev // (ep * tp * sp * pp))
    mesh = pmesh.make_mesh(dp=dp, ep=ep, tp=tp, sp=sp, pp=pp,
                           devices=jax.devices()[:dp * ep * tp * sp * pp])
    if sp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        pmesh.set_activation_sharding(NamedSharding(
            mesh, _P(pmesh.DATA_AXIS, pmesh.SEQ_AXIS)))
    if pp > 1:
        pmesh.set_pipeline(mesh, args.pp_microbatches)
    needs_rng = _needs_rng(model_cfg, tcfg)
    n_label_args = ((8 if domain_acc else 6) if hier
                    else (6 if domain_acc else 4))
    bmuf_recipe = None
    opt_state = None
    if (args.zero1 or args.fsdp) and args.bmuf:
        sys.exit("--zero1/--fsdp shard the global state over dp; "
                 "BMUF keeps per-replica local optimizers — pick one")
    if args.bmuf:
        # BMUF mode (the reference's deployed trainer,
        # bk/..._hier.py:599-614): dp replicas step locally — the step
        # is vmapped over a leading dp axis instead of psumming grads —
        # and BmufRecipe block-momentum-syncs every sync_period batches
        from m3asr_tpu.train.bmuf import BmufRecipe
        bconf = dict(raw.get("bmuf_conf") or {})
        sync_period = args.sync_period or bconf.get("sync_period", 100)
        opt_state = BmufRecipe.stack(optimizer.init(params), dp)
        params = BmufRecipe.stack(params, dp)
        bmuf_recipe = BmufRecipe(
            params, sync_period,
            block_momentum=bconf.get("block_momentum", 0.875),
            block_lr=bconf.get("block_lr", 1.0))
        step = jax.vmap(step)
        p_shard = pmesh.bmuf_stacked_sharding(mesh, params)
        o_shard = pmesh.bmuf_stacked_sharding(mesh, opt_state)
        # synced params must come back matching the step's in_shardings
        bmuf_recipe.param_sharding = p_shard
        b_shard = pmesh.batch_sharding(mesh)   # (dp, B/dp, ...) axis 0
        in_shardings = (p_shard, o_shard) + (b_shard,) * n_label_args
        if needs_rng:
            in_shardings = in_shardings + (b_shard,)
        jstep = jax.jit(step, in_shardings=in_shardings,
                        out_shardings=(p_shard, o_shard, b_shard))
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
    else:
        p_shard = pmesh.param_sharding(mesh, params, tp=tp > 1, pp=pp > 1)
        opt_probe = optimizer.init(params)
        o_shard = pmesh.param_sharding(mesh, opt_probe, tp=tp > 1,
                                       pp=pp > 1)
        if args.zero1 or args.fsdp:
            # ZeRO-1: optimizer moments shard over dp (1/dp per-device
            # optimizer memory; grads scatter, update runs sharded,
            # params gather back — all inserted by GSPMD). The initial
            # state must be PLACED in that layout (jit in_shardings
            # rejects a mismatching committed sharding).
            o_shard = pmesh.zero_sharding(mesh, opt_probe, o_shard)
            opt_state = jax.device_put(opt_probe, o_shard)
        if args.fsdp:
            # FSDP / ZeRO-3: master params ALSO shard over dp — XLA
            # all-gathers each weight at its use site and keeps the
            # resident copy 1/dp-sized (composes with ep/tp splits)
            p_shard = pmesh.zero_sharding(mesh, params, p_shard)
        # feat stays batch-sharded even under --sp: loader batches pad
        # to the batch max (arbitrary T), and a (dp, sp) input sharding
        # requires T % sp == 0 — the first constrain_act time-shards
        # activations right after the frontend instead
        b_shard = pmesh.batch_sharding(mesh)
        r_shard = pmesh.replicated(mesh)
        in_shardings = (p_shard, o_shard, b_shard) + (r_shard,) * (
            n_label_args - 1)
        if needs_rng:
            in_shardings = in_shardings + (r_shard,)
        jstep = jax.jit(step, in_shardings=in_shardings,
                        out_shardings=(p_shard, o_shard, r_shard))
        params = jax.device_put(params, p_shard)

    valid_step = None
    # validation never augments (spec_aug is a training-only transform)
    import dataclasses as _dc
    vcfg = _dc.replace(tcfg, spec_aug=False)
    if cv_loader is not None and not hier:
        def valid_step(p, feat, feat_len, targets, target_lens):
            return loss_fn(p, model_cfg, vcfg, feat, feat_len, targets,
                           target_lens)[0]
        valid_step = jax.jit(valid_step)
    elif cv_loader is not None:
        # hier validation scores CTC only (cv arks carry CTC labels)
        vkw = dict(tkw, spec_aug=False)
        def valid_step(p, feat, feat_len, targets, target_lens):
            return loss_fn(p["encoder"], model_cfg,
                           TrainConfig(**vkw), feat, feat_len, targets,
                           target_lens)[0]
        valid_step = jax.jit(valid_step)

    os.makedirs(args.output_dir, exist_ok=True)
    logger = set_logger("m3asr.train",
                        log_file=args.log_file or
                        os.path.join(args.output_dir, "train.log"))
    batch_keys = ("data", "lens", "target", "target_lens")
    if hier:
        batch_keys += ("aed_target", "aed_target_lens")
    if domain_acc:
        batch_keys += ("domain", "acc")
    trainer = Trainer(model_cfg, params, optimizer, jstep,
                      bmuf=bmuf_recipe, opt_state=opt_state,
                      batch_keys=batch_keys,
                      make_loader=make_tr_loader, valid_loader=cv_loader,
                      save_dir=args.output_dir,
                      log_period=raw.get("log_period", 100),
                      save_period=raw.get("save_period"),
                      max_epochs=raw.get("max_epoch", args.max_epochs),
                      step_takes_rng=needs_rng, seed=args.seed,
                      scalar_dir=os.path.join(args.output_dir, "scalars"),
                      logger=logger)
    if args.resume:
        trainer.load_checkpoint("last")
    with mesh:
        trainer.run(valid_step)
    trainer.save_checkpoint("final")
    print(f"training done: {args.output_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="TPU ASR training")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--tr_rspecifier", required=True,
                        help="training features ark/scp (or wav scp with "
                             "loader_conf.raw_wav)")
    parser.add_argument("--tr_labels", required=True)
    parser.add_argument("--tr_aed_labels", required=False)
    parser.add_argument("--tr_domain_labels", required=False,
                        help="per-utterance domain-id int-vector ark; "
                             "activates the domain classifier head")
    parser.add_argument("--tr_acc_labels", required=False,
                        help="per-utterance accent-id int-vector ark; "
                             "activates the accent classifier head")
    parser.add_argument("--cv_rspecifier", required=False)
    parser.add_argument("--cv_labels", required=False)
    parser.add_argument("--config", required=True)
    parser.add_argument("--log_file", required=False)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel mesh axis (Megatron-style "
                        "column/row weight splits; beyond-reference)")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel mesh axis (per-block "
                        "activation time-sharding; beyond-reference)")
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel mesh axis (GPipe over "
                        "the block stack; beyond-reference)")
    parser.add_argument("--pp_microbatches", type=int, default=2,
                        help="GPipe microbatches per step (with --pp)")
    parser.add_argument("--ep", type=int, default=1,
                        help="expert-parallel mesh size")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1: shard optimizer moments over dp "
                             "(1/dp per-device optimizer memory; "
                             "beyond-reference)")
    parser.add_argument("--fsdp", action="store_true",
                        help="FSDP/ZeRO-3: additionally shard master "
                             "params over dp (implies --zero1; XLA "
                             "all-gathers weights at use sites)")
    parser.add_argument("--smbr_cmd", required=False,
                        help="external lattice command for sMBR-style "
                             "sequence training; {post}/{grad}/{trans} "
                             "placeholders are substituted per batch "
                             "(the reference shells out to Kaldi "
                             "tlg/ctc-nnet-train-mpe-sequential-online)")
    parser.add_argument("--tr_trans_file", required=False,
                        help="per-utterance transcript lines ('uttid w1 "
                             "w2 ...'), strictly parallel to the feature "
                             "stream (the lattice loaders' trans_file)")
    parser.add_argument("--bmuf", action="store_true",
                        help="BMUF training: local dp-replica steps + "
                             "block-momentum sync every sync_period "
                             "batches (the reference's deployed trainer)")
    parser.add_argument("--sync_period", type=int, default=0,
                        help="BMUF sync period in batches (or YAML "
                             "bmuf_conf.sync_period; default 100)")
    parser.add_argument("--max_epochs", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    main(parser.parse_args())
