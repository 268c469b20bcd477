from m3asr_tpu.frontend.features import (FeatureTransform, apply_cmvn,
                                         compute_deltas, read_kaldi_cmvn,
                                         splice)  # noqa: F401
