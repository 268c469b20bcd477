from m3asr_tpu.decode.ctc import (ContextTrie, Hyp,  # noqa: F401
                                  PrefixBeamState, ctc_greedy_search,
                                  ctc_greedy_search_times,
                                  ctc_prefix_beam_search,
                                  ctc_prefix_beam_search_ext, log_add,
                                  token_confidence)
from m3asr_tpu.decode.lm import NgramLM, read_symbol_table  # noqa: F401
