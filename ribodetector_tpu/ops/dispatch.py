"""Kernel dispatch for the BiLSTM classify step.

Selects between the XLA `lax.scan` reference implementation
(models/bilstm.py) and the fused Pallas TPU kernel (ops/lstm_pallas.py).
kernel="auto" uses Pallas on TPU backends and scan elsewhere; "scan" or
"pallas" force a choice (runtime config key runtime.kernel).
"""

import jax
import jax.numpy as jnp

from ribodetector_tpu.models.bilstm import bilstm_logits


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def unpack_b5_tokens(packed, max_len):
    """Device-side inverse of native.pack_b5: [B, (T+2)//3] uint8 base-5
    packed bytes -> [B, max_len] int32 tokens.

    Token batches cross the host->device link 3x smaller this way; two
    integer divmods on device are ~free next to the LSTM scan.
    """
    p32 = packed.astype(jnp.int32)
    t0 = p32 % 5
    t1 = (p32 // 5) % 5
    t2 = p32 // 25
    return jnp.stack([t0, t1, t2], axis=-1).reshape(packed.shape[0], -1)[
        :, :max_len
    ]


def classify_logits(
    params,
    tokens,
    lengths=None,
    *,
    semantics="dense",
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    kernel="auto",
    matmul="auto",
):
    """[B, T] tokens -> [B, 2] logits using the selected kernel.

    matmul selects the Pallas MXU precision mode ("x6" exact / "x3"
    argmax-parity / "x1" fast / "auto"); the scan kernel runs fp32 natively
    so the flag only affects the Pallas path.
    """
    if kernel == "auto":
        kernel = "pallas" if _on_tpu() else "scan"
    if kernel == "pallas":
        from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas

        return bilstm_logits_pallas(
            params,
            tokens,
            lengths,
            semantics=semantics,
            compute_dtype=compute_dtype,
            precision=precision,
            matmul=matmul,
        )
    if kernel == "scan":
        return bilstm_logits(
            params,
            tokens,
            lengths,
            semantics=semantics,
            compute_dtype=compute_dtype,
            precision=precision,
        )
    raise ValueError(f"unknown kernel: {kernel}")
