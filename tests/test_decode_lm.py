"""ARPA n-gram LM + shallow fusion in the extended CTC prefix beam.

The reference decodes LM-free (encoder.py:156-260); this is the
serving-side fusion its WeNet lineage gets from WFST runtimes, done
host-side over the model's output-unit ids.
"""

import math

import numpy as np
import pytest

from m3asr_tpu.decode import native
from m3asr_tpu.decode.ctc import ctc_prefix_beam_search_ext
from m3asr_tpu.decode.lm import LOG10, NgramLM, read_symbol_table

ARPA = """\
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.5 1 -0.3
-0.7 2 -0.2
-1.0 <s> -0.1
-0.9 </s>

\\2-grams:
-0.2 1 2
-0.4 <s> 1

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return NgramLM(str(p))


def test_arpa_backoff_math(lm):
    s0 = lm.start()
    # bigram <s> 1 listed
    s1, lp = lm.score(s0, 1)
    assert lp == pytest.approx(-0.4 * LOG10)
    # bigram 1 2 listed
    s2, lp = lm.score(s1, 2)
    assert lp == pytest.approx(-0.2 * LOG10)
    # (2, 1) unlisted: backoff(2) + unigram(1)
    _, lp = lm.score(s2, 1)
    assert lp == pytest.approx((-0.2 - 0.5) * LOG10)
    # unknown token, no <unk> listed: backoff(2) + floor
    _, lp = lm.score(s2, 3)
    assert lp == pytest.approx((-0.2 - 20.0) * LOG10)
    # eos
    assert lm.score_eos(s2) == pytest.approx((-0.2 - 0.9) * LOG10)


def test_symbol_table_mapping(tmp_path):
    arpa = ARPA.replace(" 1", " a").replace(" 2", " b")
    (tmp_path / "lm_sym.arpa").write_text(arpa)
    (tmp_path / "units.txt").write_text("a 1\nb 2\n")
    sym = read_symbol_table(str(tmp_path / "units.txt"))
    lm_sym = NgramLM(str(tmp_path / "lm_sym.arpa"), sym)
    _, lp = lm_sym.score(lm_sym.start(), 1)
    assert lp == pytest.approx(-0.4 * LOG10)


def test_lm_fusion_flips_near_tie(lm):
    # [1] vs [2] near-tied acoustically; the LM strongly prefers
    # <s> 1 (-0.4) over <s> 2 (backoff -0.1 + uni -0.7 = -0.8), so a
    # slight acoustic edge for 2 is overturned at lm_weight 2
    V, T = 4, 3
    lp = np.log(np.array([
        [0.05, 0.46, 0.48, 0.01],
        [0.90, 0.04, 0.05, 0.01],
        [0.90, 0.04, 0.05, 0.01],
    ], np.float32))
    plain = ctc_prefix_beam_search_ext(lp, T, 64)
    assert list(plain[0].tokens) == [2]
    fused = ctc_prefix_beam_search_ext(lp, T, 64, lm=lm, lm_weight=2.0)
    assert list(fused[0].tokens) == [1]
    # exact accounting (beam wide enough that nothing is pruned)
    ps = {h.tokens: h.score for h in plain}
    fs = {h.tokens: h.score for h in fused}
    _, lp1 = lm.score(lm.start(), 1)
    assert fs[(1,)] == pytest.approx(ps[(1,)] + 2.0 * lp1, rel=1e-5)
    s1, _ = lm.score(lm.start(), 1)
    _, lp12 = lm.score(s1, 2)
    assert fs[(1, 2)] == pytest.approx(
        ps[(1, 2)] + 2.0 * (lp1 + lp12), rel=1e-5)


def test_lm_fusion_through_native_wrapper(lm):
    # the C++ n-gram twin (ngram_lm_create + fused beam) must match the
    # python implementation token/time-exact, scores to fp32 tolerance
    rng = np.random.default_rng(11)
    for trial in range(10):
        T, V = int(rng.integers(4, 20)), int(rng.integers(4, 8))
        logits = rng.normal(size=(T, V)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        py = ctc_prefix_beam_search_ext(lp, T, 6, lm=lm, lm_weight=0.7)
        nat = native.ctc_prefix_beam_search_ext(lp, T, 6, lm=lm,
                                                lm_weight=0.7)
        assert [h.tokens for h in py] == [h.tokens for h in nat]
        assert [h.times for h in py] == [h.times for h in nat]
        np.testing.assert_allclose([h.score for h in py],
                                   [h.score for h in nat], atol=1e-4)
    batch = native.ctc_prefix_beam_search_ext_batch(
        lp[None], np.array([T]), 6, lm=lm, lm_weight=0.7)
    assert [h.tokens for h in batch[0]] == [h.tokens for h in py]


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_native_lm_logp_parity(lm):
    # binding-level check of the backoff recursion on the C++ side
    import ctypes
    lib = native._load()
    h = native._lm_handle(lib, lm)
    for hist in [(), (1,), (2,), (1, 2), (-1,)]:
        for w in [1, 2, 3, -2]:
            hist_arr = np.asarray(hist, np.int32)
            got = lib.ngram_lm_logp(
                h, hist_arr.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int32)), len(hist), w)
            want = lm._logp_backoff(lm._shrink(hist), w)
            assert got == pytest.approx(want, abs=1e-5), (hist, w)
