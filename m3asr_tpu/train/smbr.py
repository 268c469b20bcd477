"""Sequence-discriminative (sMBR-style) training support.

The reference's sMBR trainers (bk/train_*_smbr*.py:560-595) write
encoder posteriors to a Kaldi ark, shell out to lattice tools
(`tlg`, `ctc-nnet-train-mpe-sequential-online`), read a per-frame
gradient ark back, and call output.backward(beam_grad). The framework
part — injecting an externally computed output-gradient through the
model — is `external_grad_step` (a vjp pullback); the Kaldi process
boundary is a pluggable callable so deployments wire in their own
lattice tools (the binaries themselves are outside this repo's scope).

Covers BOTH reference trainer shapes with one loop: the per-utterance
variants (train_lattice_smbr_ddp.py:277-297 — grep one transcript,
write one posterior, one tool call per utterance) and the multi-stream
"latticeMS" variants (train_latticeMS_smbr_ddp.py:275-307 — the loader
carries a trans_file side stream, the WHOLE batch's posteriors go out
in one ark and one `...-online-ms` call returns the batch gradient
ark). The two differ only in loader plumbing and call granularity —
KaldiLatticeBridge always writes the batch ark + batch trans file and
reads the batch gradient ark back (the MS shape; a per-utterance
deployment just points `command` at the non-MS binary and gets the
identical math one key at a time), and io/loader.py's `trans_file`
stream is the latticeMS loader contract (key-asserted per batch).

Test status: tests/test_smbr.py exercises the vjp pullback and the
posterior/gradient ark round-trip with a FAKE runner standing in for
the Kaldi binaries, AND validates the ark reader/writer/bridge against
committed spec-crafted fixtures (tests/fixtures/smbr/, generated with
raw struct packing by scripts/make_smbr_fixtures.py — bytes this
module's own IO never produced, incl. DM/CompressedMatrix/text/int-
vector variants and a byte-for-byte writer equality check). No
end-to-end run against live Kaldi binaries has been performed — the
binaries are outside this environment.
"""

from __future__ import annotations

import subprocess
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m3asr_tpu.io.kaldi_io import ArkWriter, read_ark


def external_grad_step(forward: Callable, params, opt_state,
                       optimizer: optax.GradientTransformation,
                       feat, feat_len, out_grad):
    """One update from an externally supplied d(loss)/d(logits).

    forward(params, feat, feat_len) -> (logits, out_len). out_grad has
    the logits' shape. Returns (params, opt_state, out_len). Equivalent
    of the reference's output.backward(beam_grad)."""
    def f(p):
        out, out_len = forward(p, feat, feat_len)
        return out, out_len

    (out, out_len), pullback = jax.vjp(f, params)
    grads = pullback((jnp.asarray(out_grad, out.dtype),
                      jnp.zeros_like(out_len)))[0]
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, out_len


class KaldiLatticeBridge:
    """Posteriors-out / gradients-in bridge around an external lattice
    command (the reference's Kaldi subprocess boundary)."""

    def __init__(self, command: Optional[list] = None,
                 runner: Optional[Callable[[str, str], None]] = None):
        """Either `command` (list, with {post} / {grad} / {trans}
        placeholders) to run via subprocess, or `runner(post_ark,
        grad_ark)` callable."""
        self.command = command
        self.runner = runner

    def __call__(self, keys, logits: np.ndarray, out_lens: np.ndarray,
                 post_ark: str, grad_ark: str,
                 trans: Optional[list] = None) -> Dict[str, np.ndarray]:
        with ArkWriter(post_ark) as w:
            for i, key in enumerate(keys):
                w.write(key, logits[i, : int(out_lens[i])])
        trans_path = post_ark + ".trans"
        if trans is not None:
            # the lattice loaders' per-utterance transcript stream
            # (ctc_aed_lattice_loader.py:146-149) — lattice tools align
            # posteriors against these
            with open(trans_path, "w") as f:
                for line in trans:
                    f.write(line + "\n")
        if self.runner is not None:
            self.runner(post_ark, grad_ark)
        elif self.command is not None:
            cmd = [c.format(post=post_ark, grad=grad_ark,
                            trans=trans_path) for c in self.command]
            subprocess.run(cmd, check=True)
        else:
            raise ValueError("no lattice command or runner configured")
        return dict(read_ark(grad_ark))


def make_external_grad_step(forward: Callable,
                            optimizer: optax.GradientTransformation):
    """Jitted wrapper of external_grad_step for the epoch loop (one
    compile per batch shape; pair with loader bucket_lengths)."""

    @jax.jit
    def step(params, opt_state, feat, feat_len, out_grad):
        return external_grad_step(forward, params, opt_state, optimizer,
                                  feat, feat_len, out_grad)

    return step


def run_smbr_training(model_cfg, forward: Callable, params, optimizer,
                      make_loader: Callable, bridge: KaldiLatticeBridge,
                      work_dir: str, max_epochs: int = 1, logger=None,
                      log_period: int = 100):
    """The sMBR epoch loop (bk/..._hier.py:560-595): per batch, write
    encoder posteriors to an ark, run the external lattice command
    ({post}/{grad}/{trans} placeholders), read the per-frame gradient
    ark back, and push it through the model with a vjp pullback
    (`output.backward(beam_grad)`).

    forward(params, feat, feat_len) -> (logits, out_len).
    make_loader() must yield batches with 'keys' (and 'trans' when a
    transcript stream is configured). Saves params each epoch into
    work_dir. Returns (params, opt_state, num_batches)."""
    import os
    import pickle

    opt_state = optimizer.init(params)
    fwd = jax.jit(forward)
    grad_step = make_external_grad_step(forward, optimizer)
    n = 0
    for epoch in range(max_epochs):
        for batch in make_loader():
            keys = batch["keys"]
            feat = jnp.asarray(batch["data"])
            feat_len = jnp.asarray(batch["lens"])
            logits, out_len = fwd(params, feat, feat_len)
            logits_np = np.asarray(logits)
            out_len_np = np.asarray(out_len)
            post = os.path.join(work_dir, "post.ark")
            grad = os.path.join(work_dir, "grad.ark")
            if os.path.exists(grad):
                os.remove(grad)   # never read a stale gradient ark
            grads = bridge(keys, logits_np, out_len_np, post, grad,
                           trans=batch.get("trans"))
            # defend against a misbehaving external tool mid-training:
            # missing utterances get zero gradient (skip-and-log),
            # overlong gradients are clamped to the emitted frames
            out_grad = np.zeros_like(logits_np)
            for i, k in enumerate(keys):
                g = grads.get(k)
                if g is None:
                    if logger is not None:
                        logger.warning(
                            f"lattice tool returned no gradient for "
                            f"{k!r}; skipping the utterance")
                    continue
                L = min(g.shape[0], int(out_len_np[i]))
                if g.shape[0] != out_len_np[i] and logger is not None:
                    logger.warning(
                        f"gradient length {g.shape[0]} != posterior "
                        f"length {int(out_len_np[i])} for {k!r}; "
                        f"clamping to {L}")
                out_grad[i, :L] = g[:L]
            params, opt_state, _ = grad_step(params, opt_state, feat,
                                             feat_len,
                                             jnp.asarray(out_grad))
            n += 1
            if logger is not None and n % log_period == 0:
                logger.info(f"smbr epoch {epoch} batch {n}")
        with open(os.path.join(work_dir, f"smbr_epoch{epoch}.pkl"),
                  "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, params), f)
    return params, opt_state, n
