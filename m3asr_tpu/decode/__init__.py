from m3asr_tpu.decode.ctc import (ctc_greedy_search, ctc_prefix_beam_search,
                                  log_add)  # noqa: F401
