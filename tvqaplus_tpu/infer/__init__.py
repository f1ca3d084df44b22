from tvqaplus_tpu.infer.predict import (
    InferenceRunner,
    get_att_predictions,
    spans_to_seconds,
)
