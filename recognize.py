#!/usr/bin/env python3
"""End-to-end recognition CLI: Kaldi feature archive -> transcripts.

Ties the full pipeline together (the reference splits this across
infer.py + host decode in the trainer repo): ark/scp features ->
frontend transform (deltas/CMVN/splice) -> bucketed engine -> CTC
greedy / prefix beam search (native C++ when available) -> hyps, with
optional reference labels for CER.

Usage:
  python recognize.py -p engine_dir -i feats.ark [-l labels.ark]
                      [-d greedy|beam] [-b beam] [--cmvn stats]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _rescore(nbests, res, out_lens, engine, decoders, args, hier, deep):
    """AED (hier-)attention rescoring of the CTC nbests; `deep` is the
    index of the hidden/taps in the engine result tuple (3 when a
    sparse decode output precedes them, else 2)."""
    from m3asr_tpu.models.aed import (attention_rescoring,
                                      hier_attention_rescoring)
    cfg = engine.model_cfg
    rw = (args.reverse_weight if args.reverse_weight >= 0
          else cfg.reverse_weight)
    hyps = []
    for b, nb in enumerate(nbests):
        if hier:
            taps = tuple(h[b:b + 1] for h in res[deep:deep + 3])
            hyp, _ = hier_attention_rescoring(
                decoders, cfg.decoder_conf, nb, taps,
                int(out_lens[b]), sos=cfg.sos, eos=cfg.eos,
                ignore_id=0, ctc_weight=args.ctc_weight,
                reverse_weight=rw)
        else:
            hyp, _ = attention_rescoring(
                decoders["decoder"], cfg.decoder_conf,
                nb, res[deep][b:b + 1], int(out_lens[b]),
                sos=cfg.sos, eos=cfg.eos,
                ignore_id=0, ctc_weight=args.ctc_weight,
                reverse_weight=rw)
        hyps.append(hyp)
    return hyps


def main(args):
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    from m3asr_tpu.decode import native
    from m3asr_tpu.io.loader import DataLoader
    from m3asr_tpu.runtime.engine import Engine
    from m3asr_tpu.utils.text import cer

    context = None
    if args.context_file:
        from m3asr_tpu.decode.ctc import ContextTrie
        if args.decode not in ("beam", "rescore"):
            sys.exit("--context_file biasing needs -d beam/rescore")
        with open(args.context_file) as fh:
            phrases = [[int(t) for t in line.split()]
                       for line in fh if line.strip()]
        context = ContextTrie(phrases, bonus=args.context_bonus)
    lm = None
    id2sym = None
    if args.units:
        from m3asr_tpu.decode.lm import read_symbol_table
        id2sym = {v: k for k, v in read_symbol_table(args.units).items()}
    if args.lm:
        from m3asr_tpu.decode.lm import NgramLM, read_symbol_table
        if args.decode not in ("beam", "rescore"):
            sys.exit("--lm shallow fusion needs -d beam/rescore")
        symtab = read_symbol_table(args.units) if args.units else None
        lm = NgramLM(args.lm, symtab)

    engine = Engine.load(args.plan_name)
    decoders = None
    hier = False
    if args.decode in ("rescore", "attention"):
        from m3asr_tpu.runtime.engine import _unflatten
        dec_path = os.path.join(args.plan_name, "decoders.npz")
        if not os.path.exists(dec_path):
            sys.exit(f"{args.decode} decoding needs decoders.npz in the "
                     "engine dir (build from an AED checkpoint)")
        import jax.numpy as jnp
        import jax as _jax
        decoders = _jax.tree.map(jnp.asarray,
                                 _unflatten(dict(np.load(dec_path))))
        hier = (args.decode == "rescore" and args.hier_rescore
                and any(k in decoders for k in ("decoder_1", "decoder_2")))
        if hier:
            engine.cfg.return_taps = True
        else:
            engine.cfg.return_hidden = True
    loader = DataLoader(
        args.input_rspec, args.label_rspec,
        loader_conf={"feat_dim": args.feat_dim,
                     "add_deltas": args.add_deltas,
                     "cmvn_file": args.cmvn_file,
                     "batch_size": args.batch_size,
                     "raw_wav": args.raw_wav,
                     "feature_extraction_conf": {
                         "mel_bins": args.feat_dim,
                         "frame_length": 25, "frame_shift": 10}})

    hyps_all, refs_all = [], []
    t0 = time.perf_counter()
    frames = 0
    max_bucket = engine.buckets.lengths[-1]
    for batch in loader(output_keys=True):
        if int(np.max(batch["lens"])) > max_bucket:
            # long-form: utterances beyond the largest bucket decode
            # through windowed center-cut stitching (the reference
            # engine cannot run these at all — its max optimization
            # profile is 6100 frames, builder.py:62-68)
            if args.decode == "attention":
                sys.exit(f"utterance longer than the max bucket "
                         f"({max_bucket}) — standalone attention decode "
                         "is not defined over stitched windows; use "
                         "-d greedy/beam (or rescore on a taps engine)")
            if args.decode == "rescore" and not (
                    engine.cfg.return_taps or engine.cfg.return_hidden):
                sys.exit("long-form rescoring needs the stitched "
                         "decoder memories — build the engine with "
                         "--return_taps (hier) or --return_hidden")
            rs = [engine.infer_long(batch["data"][i][:int(li)], int(li),
                                    overlap=args.long_overlap)
                  for i, li in enumerate(batch["lens"])]

            def pad_stack(rows, time_axis=0):
                mx = max(r.shape[time_axis] for r in rows)
                return np.stack([np.pad(r, tuple(
                    (0, mx - r.shape[time_axis]) if a == time_axis
                    else (0, 0) for a in range(r.ndim))) for r in rows])

            olens = np.asarray([int(r[1][0]) for r in rs], np.int32)
            if engine.cfg.decode_output == "beam":
                # (ids (B,beam,T'), out_len, hyp_lens, scores) [+ taps]
                res = (pad_stack([r[0][0] for r in rs], time_axis=1),
                       olens,
                       np.concatenate([r[2] for r in rs]),
                       np.concatenate([r[3] for r in rs]))
                tail0 = 4
            else:
                res = (pad_stack([r[0][0] for r in rs]), olens)
                tail0 = 2
            # frame-aligned extras (sparse aux, taps, hidden)
            res += tuple(pad_stack([np.asarray(r[j])[0] for r in rs])
                         for j in range(tail0, len(rs[0])))
        else:
            res = engine.infer(batch["data"], batch["lens"])
        out, out_lens = res[0], res[1]
        # on-device decode outputs (build.py --decode_output): argmax
        # ships (ids, best log-prob), topk ships (values, indices) —
        # hidden/taps (rescoring memories) follow the sparse extra
        mode = engine.cfg.decode_output
        sparse = mode in ("argmax", "topk")
        aux = res[2] if sparse else None
        deep = 4 if mode == "beam" else 3 if sparse else 2
        frames += int(np.sum(batch["lens"]))
        if args.decode == "attention":
            # standalone AED beam search over the encoder hidden (the
            # WeNet-style recognize() the reference's finish-mask
            # utilities target, utils/mask.py:205-251) — no CTC involved
            from m3asr_tpu.models.aed import attention_search_decode
            cfg = engine.model_cfg
            hyps = attention_search_decode(
                decoders["decoder"], cfg.decoder_conf, res[deep], out_lens,
                beam_size=args.beam_size, sos=cfg.sos, eos=cfg.eos)
        elif mode == "beam" and args.decode in ("greedy", "beam",
                                                "rescore"):
            # the prefix beam search already ran INSIDE the engine
            # (decode/device.py): res carries (B, beam, T') n-best ids
            # + (B, beam) lens/scores — nothing to search on the host
            if args.timestamps:
                sys.exit("the on-device beam emits token ids only; "
                         "build with --decode_output topk for "
                         "timestamped beam decoding")
            if context is not None or lm is not None:
                sys.exit("hotword/LM fusion is a host-side search "
                         "feature; build with --decode_output topk to "
                         "combine it with sparse on-device candidates")
            hyp_lens, scores = np.asarray(res[2]), np.asarray(res[3])
            if args.decode == "rescore":
                nbests = [[(tuple(int(t) for t in out[b, j, :hyp_lens[b, j]]),
                            float(scores[b, j]))
                           for j in range(out.shape[1])
                           if np.isfinite(scores[b, j])]
                          for b in range(out.shape[0])]
                hyps = _rescore(nbests, res, out_lens, engine, decoders,
                                args, hier, deep)
            else:
                # greedy on a beam engine serves the best hypothesis
                hyps = [[int(t) for t in out[b, 0, :hyp_lens[b, 0]]]
                        for b in range(out.shape[0])]
        elif args.decode == "greedy":
            if sparse:
                # ids/log-probs were reduced on device; top-1 of the
                # top-K rows IS the argmax
                ids = out if mode == "argmax" else aux[..., 0]
                best = aux if mode == "argmax" else out[..., 0]
                from m3asr_tpu.decode.ctc import (ctc_greedy_from_ids,
                                                  ctc_greedy_times_from_ids)
                if args.timestamps:
                    ghyps = ctc_greedy_times_from_ids(ids, best, out_lens)
                    times = [list(h.times) for h in ghyps]
                    hyps = [list(h.tokens) for h in ghyps]
                else:
                    hyps = ctc_greedy_from_ids(ids, out_lens)
            elif args.timestamps:
                from m3asr_tpu.decode.ctc import ctc_greedy_search_times
                ghyps = ctc_greedy_search_times(out, out_lens)
                times = [list(h.times) for h in ghyps]
                hyps = [list(h.tokens) for h in ghyps]
            else:
                hyps = native.ctc_greedy_search(out, out_lens)
        elif mode == "argmax":
            sys.exit("-d beam/rescore needs per-frame candidates: build "
                     "the engine with --decode_output topk (or "
                     "logits/log_softmax), not argmax")
        elif mode == "topk":
            if args.beam_size > out.shape[-1]:
                sys.exit(f"beam_size {args.beam_size} > engine "
                         f"decode_topk {out.shape[-1]} — rebuild with a "
                         "larger --decode_topk for exact beam search")
            # sparse beam straight over the device-selected candidates
            nbests = native.ctc_prefix_beam_search_sparse_batch(
                out, aux, out_lens, args.beam_size, context=context,
                lm=lm, lm_weight=args.lm_weight)
            if args.timestamps and args.decode == "beam":
                times = [list(nb[0].times) for nb in nbests]
            if args.decode == "rescore":
                nbests = [[(h.tokens, h.score) for h in nb]
                          for nb in nbests]
                hyps = _rescore(nbests, res, out_lens, engine, decoders,
                                args, hier, deep)
            else:
                hyps = [list(nb[0][0]) for nb in nbests]
        else:
            m = out.max(-1, keepdims=True)
            lp = out - m - np.log(np.exp(out - m).sum(-1, keepdims=True))
            if (args.timestamps and args.decode == "beam") \
                    or context is not None or lm is not None:
                # extended beam: timestamps and/or LM-fused +
                # context-biased nbest scores; for -d rescore the AED
                # decoder then re-ranks this LM/context-aware nbest
                # (CTC+LM+AED — a combined pipeline the reference's
                # commented rescorer never had)
                nbests = native.ctc_prefix_beam_search_ext_batch(
                    lp, out_lens, args.beam_size, context=context,
                    lm=lm, lm_weight=args.lm_weight)
                times = [list(nb[0].times) for nb in nbests]
                if args.decode == "rescore":
                    nbests = [[(h.tokens, h.score) for h in nb]
                              for nb in nbests]
            else:
                nbests = native.ctc_prefix_beam_search_batch(
                    lp, out_lens, args.beam_size)
            if args.decode == "rescore":
                hyps = _rescore(nbests, res, out_lens, engine, decoders,
                                args, hier, deep)
            else:
                hyps = [list(nb[0][0]) for nb in nbests]
        def sym(t):
            return id2sym.get(t, str(t)) if id2sym else str(t)

        for bi, (key, h) in enumerate(zip(batch["keys"], hyps)):
            if args.timestamps and args.decode in ("greedy", "beam"):
                # tok:frame pairs; frames are post-subsample indices
                # (x subsample_factor x 10 ms for wall-clock time)
                print(f"{key} " + " ".join(
                    f"{sym(t)}:{f}" for t, f in zip(h, times[bi])))
            else:
                print(f"{key} {' '.join(sym(t) for t in h)}")
            hyps_all.append(h)
        if "target" in batch:
            for i in range(len(hyps)):
                refs_all.append(
                    list(batch["target"][i][: batch["target_lens"][i]]))
    dt = time.perf_counter() - t0
    stats = {"utts": len(hyps_all), "frames": frames,
             "wall_s": round(dt, 2),
             "rtf": round(dt / max(frames * 0.01, 1e-9), 5)}
    if refs_all:
        stats["cer"] = round(cer(refs_all, hyps_all), 5)
    print(json.dumps(stats), file=sys.stderr)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--plan_name", required=True,
                   help="engine directory")
    p.add_argument("-i", "--input_rspec", required=True,
                   help="feature ark/scp (or wav scp with --raw_wav)")
    p.add_argument("--raw_wav", action="store_true",
                   help="input is a wav scp; extract fbank on the fly "
                        "(frontend/fbank.py)")
    p.add_argument("-l", "--label_rspec", required=False,
                   help="reference labels (int-vector ark) for CER")
    p.add_argument("-d", "--decode", default="greedy",
                   choices=["greedy", "beam", "rescore", "attention"])
    p.add_argument("-b", "--beam_size", type=int, default=10)
    p.add_argument("--ctc_weight", type=float, default=0.5)
    p.add_argument("--hier_rescore", action="store_true",
                   help="rescore with all three hier decoders "
                        "(decoder/decoder_1/decoder_2 attending "
                        "h_final/h6/h12), averaged")
    p.add_argument("--reverse_weight", type=float, default=-1.0,
                   help="R2L decoder weight in rescoring; <0 = use the "
                        "model config's reverse_weight")
    p.add_argument("--timestamps", action="store_true",
                   help="emit per-token emission frames as tok:frame "
                        "(greedy/beam; frames are post-subsample)")
    p.add_argument("--context_file", required=False,
                   help="context-biasing phrases, one per line as "
                        "space-separated token ids (-d beam only)")
    p.add_argument("--context_bonus", type=float, default=3.0,
                   help="per-matched-token log-prob bonus for "
                        "--context_file phrases")
    p.add_argument("--lm", required=False,
                   help="ARPA n-gram LM for shallow fusion (-d beam): "
                        "score += lm_weight * ln P_lm(tok | hist)")
    p.add_argument("--lm_weight", type=float, default=0.5)
    p.add_argument("--units", required=False,
                   help="symbol table ('sym id' per line): maps ARPA "
                        "words to unit ids AND renders transcripts as "
                        "symbols instead of raw ids")
    p.add_argument("--feat_dim", type=int, default=40)
    p.add_argument("--add_deltas", type=int, default=0)
    p.add_argument("--cmvn", dest="cmvn_file", required=False)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--long_overlap", type=int, default=None,
                   help="input-frame overlap for long-form windowed "
                        "decode (default 64 x subsample factor)")
    main(p.parse_args())
