from m3asr_tpu.decode.ctc import (ContextTrie, Hyp,  # noqa: F401
                                  PrefixBeamState, ctc_greedy_from_ids,
                                  ctc_greedy_search,
                                  ctc_greedy_search_times,
                                  ctc_greedy_times_from_ids,
                                  ctc_prefix_beam_search,
                                  ctc_prefix_beam_search_ext,
                                  ctc_prefix_beam_search_sparse,
                                  ctc_prefix_beam_search_sparse_ext,
                                  log_add, token_confidence,
                                  token_confidence_sparse)
from m3asr_tpu.decode.lm import NgramLM, read_symbol_table  # noqa: F401
