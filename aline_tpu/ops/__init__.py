from aline_tpu.ops.target_mask import (
    create_target_mask,
    masking_description,
    select_targets_by_mask,
    target_weight_vectors,
)
