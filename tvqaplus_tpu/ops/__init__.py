from tvqaplus_tpu.ops.masking import (
    mask_logits,
    safe_softmax,
    safe_log_softmax,
    NEG_INF,
    SAFE_FLOOR,
)
