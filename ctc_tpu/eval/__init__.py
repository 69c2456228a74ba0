"""Video-level evaluation: Charades mAP and visual-relation tagging."""

from ctc_tpu.eval.map import mean_average_precision, charades_map
from ctc_tpu.eval.relation import (
    eval_tagging_scores,
    voc_ap,
    eval_visual_relation,
    compose_predictions,
    compose_ov_predictions,
)

__all__ = [
    "mean_average_precision",
    "charades_map",
    "eval_tagging_scores",
    "voc_ap",
    "eval_visual_relation",
    "compose_predictions",
    "compose_ov_predictions",
]
