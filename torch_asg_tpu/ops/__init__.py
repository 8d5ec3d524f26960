from .fac import fac_score, make_aligned
from .fcc import fcc_score
from .semiring import NEG_INF, logaddexp, logsumexp, masked_softmax
from .viterbi import AlignmentResult, ViterbiResult, viterbi_align, viterbi_decode

__all__ = [
    "fcc_score",
    "fac_score",
    "make_aligned",
    "logsumexp",
    "logaddexp",
    "masked_softmax",
    "NEG_INF",
    "viterbi_decode",
    "viterbi_align",
    "ViterbiResult",
    "AlignmentResult",
]
