from .data_parallel import (
    asg_loss_dp,
    beam_decode_dp,
    shard_batch,
    viterbi_align_dp,
    viterbi_decode_dp,
)
from .distributed import init_distributed, local_batch_slice, make_hybrid_mesh
from .mesh import make_mesh
from .sequence_parallel import asg_loss_seq
from .vocab_parallel import asg_loss_vp, fcc_score_vp

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "init_distributed",
    "local_batch_slice",
    "asg_loss_dp",
    "shard_batch",
    "viterbi_decode_dp",
    "viterbi_align_dp",
    "beam_decode_dp",
    "asg_loss_vp",
    "fcc_score_vp",
    "asg_loss_seq",
]
