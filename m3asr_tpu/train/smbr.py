"""Sequence-discriminative (sMBR-style) training support.

The reference's sMBR trainers (bk/train_*_smbr*.py:560-595) write
encoder posteriors to a Kaldi ark, shell out to lattice tools
(`tlg`, `ctc-nnet-train-mpe-sequential-online`), read a per-frame
gradient ark back, and call output.backward(beam_grad). The framework
part — injecting an externally computed output-gradient through the
model — is `external_grad_step` (a vjp pullback); the Kaldi process
boundary is a pluggable callable so deployments wire in their own
lattice tools (the binaries themselves are outside this repo's scope).

Test status: plumbing-tested only — tests/test_smbr.py exercises the
vjp pullback and the posterior/gradient ark round-trip with a FAKE
runner standing in for the Kaldi binaries; no end-to-end sMBR run
against real lattice tools has been performed.
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
        """Either `command` (list, with {post} / {grad} placeholders) to
        run via subprocess, or `runner(post_ark, grad_ark)` callable."""
        self.command = command
        self.runner = runner

    def __call__(self, keys, logits: np.ndarray, out_lens: np.ndarray,
                 post_ark: str, grad_ark: str) -> Dict[str, np.ndarray]:
        with ArkWriter(post_ark) as w:
            for i, key in enumerate(keys):
                w.write(key, logits[i, : int(out_lens[i])])
        if self.runner is not None:
            self.runner(post_ark, grad_ark)
        elif self.command is not None:
            cmd = [c.format(post=post_ark, grad=grad_ark)
                   for c in self.command]
            subprocess.run(cmd, check=True)
        else:
            raise ValueError("no lattice command or runner configured")
        return dict(read_ark(grad_ark))
