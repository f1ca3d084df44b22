from tvqaplus_tpu.infer.predict import (
    InferenceRunner,
    assemble_att_predictions,
    get_att_predictions,
    spans_to_seconds,
)
