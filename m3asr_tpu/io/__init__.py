from m3asr_tpu.io import kaldi_io  # noqa: F401
