from .data_parallel import asg_loss_dp, shard_batch
from .mesh import make_mesh
from .sequence_parallel import asg_loss_seq
from .vocab_parallel import asg_loss_vp, fcc_score_vp

__all__ = [
    "make_mesh",
    "asg_loss_dp",
    "shard_batch",
    "asg_loss_vp",
    "fcc_score_vp",
    "asg_loss_seq",
]
