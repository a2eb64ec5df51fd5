from spn4cir_tpu.ops.infonce import (
    bank_infonce,
    combine_negtype,
    cross_entropy,
    in_batch_infonce,
    l2_normalize,
    max_query_infonce,
    max_query_scores,
    negtype_losses,
    sampled_neg_infonce,
)
from spn4cir_tpu.ops.bank_kernels import bank_infonce_pallas

__all__ = [
    "bank_infonce",
    "bank_infonce_pallas",
    "combine_negtype",
    "cross_entropy",
    "in_batch_infonce",
    "l2_normalize",
    "max_query_infonce",
    "max_query_scores",
    "negtype_losses",
    "sampled_neg_infonce",
]
