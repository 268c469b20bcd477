#!/usr/bin/env python3
"""Inference CLI — TPU-native equivalent of the reference's infer.py
(reference CLI: -p plan -i feat.npy [-o cmp.npy],
/root/reference/infer.py:130-138).

Loads an engine directory, runs the encoder on a feat.npy, prints
output stats/timing, and optionally decodes (CTC greedy / prefix beam
search) or compares against a saved reference output.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(args):
    plat = os.environ.get("M3ASR_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from m3asr_tpu.runtime.engine import Engine

    feat = np.load(args.input_file)
    if feat.ndim == 2:
        feat = feat[None]
    feat_len = np.array([feat.shape[1]] * feat.shape[0], np.int32)

    engine = Engine.load(args.plan_name)

    # warm-up (compiles the bucket if not cached), then timed run —
    # mirrors infer.py:77-87
    res = engine.infer(feat, feat_len)
    t1 = time.perf_counter()
    res = engine.infer(feat, feat_len)
    t2 = time.perf_counter()
    out, out_lens = res[0], res[1]
    dmode = engine.cfg.decode_output  # argmax/topk = sparse on-device
    aux = res[2] if dmode in ("argmax", "topk") else None
    print("time=" + str((t2 - t1) * 1000) + "ms")

    print("outputs.shape:" + str(out.shape))
    print("outputs.sum:" + str(out.sum()))
    print(out)

    if args.decode != "none":
        from m3asr_tpu.decode import (ctc_greedy_from_ids,
                                      ctc_greedy_search,
                                      ctc_prefix_beam_search,
                                      ctc_prefix_beam_search_sparse)
        if dmode == "beam":
            # the search already ran inside the engine: res is
            # (n-best ids, out_len, hyp lens, scores)
            hyp_lens = np.asarray(res[2])
            hyps = [[int(t) for t in out[b, 0, :hyp_lens[b, 0]]]
                    for b in range(out.shape[0])]
        elif args.decode == "greedy":
            if dmode == "argmax":
                hyps = ctc_greedy_from_ids(out, out_lens)
            elif dmode == "topk":
                hyps = ctc_greedy_from_ids(aux[..., 0], out_lens)
            else:
                hyps = ctc_greedy_search(out, out_lens)
        elif dmode == "argmax":
            sys.exit("beam decode needs an engine built with "
                     "--decode_output topk/logits, not argmax")
        elif dmode == "topk":
            hyps = [ctc_prefix_beam_search_sparse(
                        out[b], aux[b], int(out_lens[b]),
                        args.beam_size)[0][0]
                    for b in range(out.shape[0])]
        else:
            m = out.max(-1, keepdims=True)
            lp = out - m - np.log(np.exp(out - m).sum(-1, keepdims=True))
            hyps = [ctc_prefix_beam_search(lp[b], int(out_lens[b]),
                                           args.beam_size)[0][0]
                    for b in range(out.shape[0])]
        for b, h in enumerate(hyps):
            print(f"utt{b} hyp: {list(h)}")

    if args.compare_output_file:
        cmp_out = np.load(args.compare_output_file)
        print(f"compare_output={args.compare_output_file}, "
              f"dtype={cmp_out.dtype}, shape={cmp_out.shape}")
        print("output.sum:" + str(cmp_out.sum()))
        if cmp_out.shape == out.shape:
            ok = np.allclose(cmp_out, out, rtol=1e-5, atol=1e-3)
            print("allclose(rtol=1e-05, atol=1e-03): " + str(ok))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="TPU ASR --- inference to get AM score")
    parser.add_argument("-p", "--plan_name", required=True,
                        help="The engine directory path.")
    parser.add_argument("-i", "--input_file", required=True,
                        help="The input feat.npy file path.")
    parser.add_argument("-o", "--compare_output_file", required=False,
                        help="Reference output .npy to compare against.")
    parser.add_argument("-d", "--decode", default="none",
                        choices=["none", "greedy", "beam"],
                        help="CTC decode mode")
    parser.add_argument("-b", "--beam_size", type=int, default=10)
    main(parser.parse_args())
