from ribodetector_tpu.train.loss import cross_entropy_loss, nll_loss
from ribodetector_tpu.train.metrics import (
    accuracy,
    recall,
    precision,
    f1,
    mcc,
    confusion_counts,
)
from ribodetector_tpu.train.trainer import (
    TrainConfig,
    make_train_step,
    make_eval_step,
    fit,
    synthetic_dataset,
)

__all__ = [
    "cross_entropy_loss",
    "nll_loss",
    "accuracy",
    "recall",
    "precision",
    "f1",
    "mcc",
    "confusion_counts",
    "TrainConfig",
    "make_train_step",
    "make_eval_step",
    "fit",
    "synthetic_dataset",
]
