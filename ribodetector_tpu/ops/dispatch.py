"""Kernel dispatch for the BiLSTM classify step.

Selects between the XLA `lax.scan` reference implementation
(models/bilstm.py) and the fused Pallas TPU kernel (ops/lstm_pallas.py).
kernel="auto" uses Pallas on TPU backends and scan elsewhere; "scan" or
"pallas" force a choice (runtime config key runtime.kernel).
"""

import jax
import jax.numpy as jnp

from ribodetector_tpu.models.bilstm import HIDDEN, bilstm_logits


def _on_tpu() -> bool:
    """True when the default backend is a TPU, including TPU chips exposed
    through proxy/plugin platforms (the development tunnel registers as
    platform "axon" while the devices are real TPU chips -- matching on
    the literal "tpu" alone would silently route kernel="auto" to the scan
    path on the very hardware the Pallas kernel exists for)."""
    try:
        backend = jax.default_backend()
        if backend == "tpu":
            return True
        dev = jax.devices()[0]
        kind = (getattr(dev, "device_kind", "") or "").lower()
        return "tpu" in kind or backend == "axon"
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
    # clamp t2 to the pad token: a corrupt byte > 124 would otherwise emit
    # tokens 5..7, where the three kernels legitimately diverge (the scan's
    # jnp.take clips, x6's one-hot hits zeroed columns) -- clamping keeps
    # every kernel on the defined 0..4 alphabet even for garbage input
    t2 = jnp.minimum(p32 // 25, 4)
    return jnp.stack([t0, t1, t2], axis=-1).reshape(packed.shape[0], -1)[
        :, :max_len
    ]


def unpack_b2_tokens(packed, max_len):
    """Device-side inverse of native.pack_b2: [B, (T+3)//4] uint8 2-bit
    packed bytes -> [B, max_len] int32 tokens in 0..3.

    The 2-bit format carries 4 bases/byte (vs base-5's 3/byte, a 25%
    host->device transfer cut) but can only represent A/C/G/T(U) -- the
    native parser flags records as b2-eligible only when every base is a
    clean ACGTU call at full read length, so no pad token (4) ever needs
    encoding; ineligible records keep the base-5 path (fastx.cpp
    rd_parse_fastq_b5b2).
    """
    p32 = packed.astype(jnp.int32)
    t0 = p32 & 3
    t1 = (p32 >> 2) & 3
    t2 = (p32 >> 4) & 3
    t3 = (p32 >> 6) & 3
    return jnp.stack([t0, t1, t2, t3], axis=-1).reshape(packed.shape[0], -1)[
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
    bwd_init=None,
):
    """[B, T] tokens -> [B, 2] logits using the selected kernel.

    matmul selects the Pallas MXU precision mode ("x6" exact / "x3"
    argmax-parity / "x1" fast / "auto"); the scan kernel runs fp32 natively
    so the flag only affects the Pallas path. bwd_init is the
    length-bucketing backward-carry init (models/bilstm.py
    zero_prefix_state).
    """
    # the Pallas kernel is specialized to the reference architecture
    # (hidden 128 = one TPU lane register); custom-width checkpoints
    # (config arch args / retrained models) run the shape-generic scan.
    # An explicit kernel="pallas" with a custom width is refused by the
    # kernel's own entry guard (ops/lstm_pallas.py) with the same message.
    hidden = params.w_hh_f.shape[0]
    if kernel == "auto":
        kernel = "pallas" if _on_tpu() and hidden == HIDDEN else "scan"
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
            bwd_init=bwd_init,
        )
    if kernel == "scan":
        return bilstm_logits(
            params,
            tokens,
            lengths,
            semantics=semantics,
            compute_dtype=compute_dtype,
            precision=precision,
            bwd_init=bwd_init,
        )
    raise ValueError(f"unknown kernel: {kernel}")
