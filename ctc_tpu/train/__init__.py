"""Training engine: step functions, metrics, meters, schedules, checkpoints."""

from ctc_tpu.train.metrics import (
    AverageMeter,
    topk_accuracy,
    multilabel_topk_accuracy,
    transition_accuracy,
    transition_recall,
    sequence_accuracy,
    future_accuracy,
)
from ctc_tpu.train.schedule import step_decay_schedule
from ctc_tpu.train.trainer import Trainer, TrainState, make_train_step, make_eval_step

__all__ = [
    "AverageMeter",
    "topk_accuracy",
    "multilabel_topk_accuracy",
    "transition_accuracy",
    "transition_recall",
    "sequence_accuracy",
    "future_accuracy",
    "step_decay_schedule",
    "Trainer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
