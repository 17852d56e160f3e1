from ribodetector_tpu.runtime.ensure import (
    paired_final_labels,
    separate_reads,
    separate_paired_reads,
)
from ribodetector_tpu.runtime.batching import auto_batch_size
from ribodetector_tpu.runtime.pipeline import Predictor

__all__ = [
    "paired_final_labels",
    "separate_reads",
    "separate_paired_reads",
    "auto_batch_size",
    "Predictor",
]
