from tvqaplus_tpu.evaluation.boxes import Boxes, pairwise_iou
from tvqaplus_tpu.evaluation.voc import eval_detection_voc
from tvqaplus_tpu.evaluation.tvqa_metrics import (
    compute_temporal_iou,
    compute_temporal_metrics,
    compute_att_metrics,
    load_tvqa_plus_annotation,
    load_predictions,
    evaluate_tvqa_plus,
)
