from ribodetector_tpu.models.bilstm import (
    BiLSTMParams,
    init_params,
    load_params,
    save_params,
    bilstm_logits,
    dense_gather_index,
)

__all__ = [
    "BiLSTMParams",
    "init_params",
    "load_params",
    "save_params",
    "bilstm_logits",
    "dense_gather_index",
]
