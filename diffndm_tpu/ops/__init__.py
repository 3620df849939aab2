from diffndm_tpu.ops.segment import (  # noqa: F401
    masked_mean,
    masked_sum,
    remove_mean_ligand,
    remove_mean_joint,
    sum_except_batch,
)
