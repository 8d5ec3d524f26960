"""Pallas TPU kernels — the framework's 'native' layer.

Equivalent role to the reference's C++/CUDA L1/L2 layers
(zh217/torch-asg ``native/``), rebuilt for the TPU memory hierarchy:
whole-recursion fusion, VMEM-resident lattice rows, MXU logsumexp.
"""

from .asg_kernels import asg_scores_fused
from .fac_kernels import fac_score_pallas
from .fcc_kernels import fcc_score_pallas

__all__ = ["fcc_score_pallas", "fac_score_pallas", "asg_scores_fused"]
