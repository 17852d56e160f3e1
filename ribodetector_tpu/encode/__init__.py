from ribodetector_tpu.encode.encoder import (
    PAD_TOKEN,
    TOKEN_LUT,
    encode_batch,
    tokens_to_onehot_np,
)

__all__ = ["PAD_TOKEN", "TOKEN_LUT", "encode_batch", "tokens_to_onehot_np"]
