"""torch_asg_tpu: TPU-native Auto Segmentation Criterion (ASG) framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
zh217/torch-asg (PyTorch/C++/CUDA), redesigned TPU-first.  See README.md
and SURVEY.md at the repo root.
"""

from .asg import ASGLoss, asg_loss, asg_scores
from .ops.fac import fac_score
from .ops.fcc import fcc_score
from .ops.posteriors import fac_posteriors, fcc_posteriors, posterior_decode
from .ops.viterbi import (alignment_segments, beam_decode, beam_nbest,
                          viterbi_align, viterbi_decode, viterbi_nbest)
from .ops.streaming import (StreamingAlignState, StreamingBeamState,
                            StreamingNBestState,
                            StreamingState, streaming_align_backtrace,
                            streaming_align_init, streaming_align_update,
                            StreamingViterbiState, StreamingWFSAState,
                            StreamTargets, streaming_beam_backtrace,
                            streaming_beam_init,
                            streaming_beam_nbest_backtrace,
                            streaming_beam_update,
                            streaming_init,
                            streaming_nbest_backtrace, streaming_nbest_init,
                            streaming_nbest_update, streaming_scores,
                            streaming_targets, streaming_update,
                            streaming_viterbi_backtrace,
                            streaming_viterbi_init, streaming_viterbi_update,
                            streaming_wfsa_init, streaming_wfsa_scores,
                            streaming_wfsa_update,
                            StreamingWFSAViterbiState,
                            streaming_wfsa_viterbi_backtrace,
                            streaming_wfsa_viterbi_init,
                            streaming_wfsa_viterbi_update)
from .ops.wfsa import (WFSA, chain_wfsa, full_wfsa, lexicon_wfsa,
                       wfsa_posteriors, wfsa_score, wfsa_viterbi)

__version__ = "0.1.0"

__all__ = [
    "ASGLoss",
    "asg_loss",
    "asg_scores",
    "fcc_score",
    "fac_score",
    "fcc_posteriors",
    "fac_posteriors",
    "posterior_decode",
    "viterbi_decode",
    "viterbi_align",
    "viterbi_nbest",
    "beam_decode",
    "beam_nbest",
    "alignment_segments",
    "WFSA",
    "chain_wfsa",
    "full_wfsa",
    "lexicon_wfsa",
    "wfsa_score",
    "wfsa_viterbi",
    "wfsa_posteriors",
    "StreamingState",
    "streaming_init",
    "streaming_update",
    "streaming_scores",
    "StreamTargets",
    "streaming_targets",
    "StreamingViterbiState",
    "streaming_viterbi_init",
    "streaming_viterbi_update",
    "streaming_viterbi_backtrace",
    "streaming_beam_init",
    "streaming_beam_update",
    "streaming_beam_backtrace",
    "streaming_beam_nbest_backtrace",
    "StreamingWFSAViterbiState",
    "streaming_wfsa_viterbi_init",
    "streaming_wfsa_viterbi_update",
    "streaming_wfsa_viterbi_backtrace",
    "StreamingWFSAState",
    "streaming_wfsa_init",
    "streaming_wfsa_update",
    "streaming_wfsa_scores",
    "StreamingNBestState",
    "streaming_nbest_init",
    "streaming_nbest_update",
    "streaming_nbest_backtrace",
    "StreamingAlignState",
    "StreamingBeamState",
    "streaming_align_init",
    "streaming_align_update",
    "streaming_align_backtrace",
]
