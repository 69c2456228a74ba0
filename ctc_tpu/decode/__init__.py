"""Decoding: greedy / beam-search CTC decode and blank-free Viterbi alignment."""

from ctc_tpu.decode.greedy import greedy_decode, collapse_repeats
from ctc_tpu.decode.beam import beam_search_decode
from ctc_tpu.decode.viterbi import viterbi_align

__all__ = [
    "greedy_decode",
    "collapse_repeats",
    "beam_search_decode",
    "viterbi_align",
]
