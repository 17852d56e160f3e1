"""Bidirectional LSTM read classifier: parameters + reference forward.

Architecture parity with the reference SeqModel (input 4, hidden 128, 1 layer,
bidirectional, Linear(256->2) head; reference: ribodetector/model/model.py:10-29,
ribodetector/config.json:6-14), re-expressed as a functional JAX pytree and a
`lax.scan` recurrence. ~137,730 fp32 params -- small enough to pin entirely in
VMEM on TPU (SURVEY.md 3.5).

Weight layout (converted once from the torch checkpoint, see convert.py):

  w_ih_{f,b} : [4, 512]   input projection, transposed from torch [512, 4]
  w_hh_{f,b} : [128, 512] recurrent projection, transposed from torch [512,128]
  b_{f,b}    : [512]      b_ih + b_hh summed (they only ever appear summed)
  w_out      : [256, 2]   head, transposed from torch [2, 256]
  b_out      : [2]

Gate order along the 512 axis is torch's i,f,g,o (4 x 128 blocks).

Two gather semantics are implemented (SURVEY.md 3.4 -- they are NOT
bit-identical for padded reads and the reference exposes both):

- "dense" (the ONNX / detect_cpu path, model_cpu.py:29-37,57-62): both
  directions run over all T rows including zero padding (zero input still
  evolves state through the biases); the output is gathered at the LAST
  NON-ZERO INPUT ROW, computed as T-1-argmax(flip(rowsum)) which falls back
  to T-1 for an all-zero read (np.argmax-of-zeros quirk).

- "packed" (the cuDNN PackedSequence path, model.py:32-37,114-119): the
  recurrence covers exactly the true read length L; the forward state is
  taken at t=L-1 and the backward direction STARTS at t=L-1 (so the gathered
  backward state has absorbed no padding steps).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

HIDDEN = 128
GATES = 4 * HIDDEN
ALPHABET = 4  # A C G T; token 4 = zero row / padding
NUM_CLASSES = 2


class BiLSTMParams(NamedTuple):
    w_ih_f: jax.Array  # [4, 512]
    w_hh_f: jax.Array  # [128, 512]
    b_f: jax.Array  # [512]
    w_ih_b: jax.Array  # [4, 512]
    w_hh_b: jax.Array  # [128, 512]
    b_b: jax.Array  # [512]
    w_out: jax.Array  # [256, 2]
    b_out: jax.Array  # [2]


def init_params(key, hidden=HIDDEN, dtype=jnp.float32) -> BiLSTMParams:
    """Random init matching the torch reference's defaults: LSTM tensors
    uniform +-1/sqrt(hidden) (nn.LSTM), head weight AND bias uniform
    +-1/sqrt(2*hidden) (nn.Linear's fan-in bound -- the head's input is
    the 2*hidden bidirectional concat)."""
    ks = jax.random.split(key, 10)
    bound = 1.0 / np.sqrt(hidden)
    hbound = 1.0 / np.sqrt(2 * hidden)
    g = 4 * hidden

    def u(k, shape, b=bound):
        return jax.random.uniform(k, shape, dtype, minval=-b, maxval=b)

    return BiLSTMParams(
        w_ih_f=u(ks[0], (ALPHABET, g)),
        w_hh_f=u(ks[1], (hidden, g)),
        b_f=u(ks[2], (g,)) + u(ks[3], (g,)),
        w_ih_b=u(ks[4], (ALPHABET, g)),
        w_hh_b=u(ks[5], (hidden, g)),
        b_b=u(ks[6], (g,)) + u(ks[7], (g,)),
        w_out=u(ks[8], (2 * hidden, NUM_CLASSES), hbound),
        b_out=u(ks[9], (NUM_CLASSES,), hbound),
    )


def param_count(params: BiLSTMParams) -> int:
    """Stored parameter count (136,706 for the reference arch: the torch
    checkpoint's redundant b_ih/b_hh pairs are merged into one bias per
    direction, see convert.py)."""
    return sum(int(np.prod(np.shape(p))) for p in params)


def reference_param_count(params: BiLSTMParams) -> int:
    """Parameter count in the reference's torch layout (137,730; BASELINE.md
    "Model size"), i.e. counting both of each direction's bias vectors."""
    return param_count(params) + int(np.shape(params.b_f)[0]) + int(
        np.shape(params.b_b)[0]
    )


def describe(params: BiLSTMParams) -> str:
    """Human-readable summary, counterpart of BaseModel.__str__
    (reference: ribodetector/base/base_model.py:16-25)."""
    lines = [
        f"  {name}: {tuple(np.shape(p))}" for name, p in params._asdict().items()
    ]
    return (
        "BiLSTMParams(\n"
        + "\n".join(lines)
        + f"\n)\nTrainable parameters: {param_count(params)}"
    )


def save_params(path, params: BiLSTMParams, meta: dict | None = None):
    arrays = {k: np.asarray(v) for k, v in params._asdict().items()}
    if meta:
        import json

        # default=str: trainer metadata may hold non-JSON values (paths,
        # numpy scalars); degrade them to strings instead of crashing the
        # checkpoint write (keeps parity with the converter's encoding --
        # the ONE other writer of this field, models/convert.py)
        arrays["_meta_json"] = np.frombuffer(
            json.dumps(meta, default=str).encode("utf-8"), dtype=np.uint8
        )
    np.savez(path, **arrays)


def load_params(path, dtype=jnp.float32) -> BiLSTMParams:
    with np.load(path) as z:
        return BiLSTMParams(
            **{
                k: jnp.asarray(z[k], dtype)
                for k in BiLSTMParams._fields
            }
        )


def load_params_meta(path) -> dict:
    import json

    with np.load(path) as z:
        if "_meta_json" in z:
            return json.loads(z["_meta_json"].tobytes().decode("utf-8"))
    return {}


def dense_gather_index(tokens):
    """Index of the last non-zero input row per read; T-1 if none.

    Matches last_out_items' T-1-argmax(flip(rowsum)) (model_cpu.py:57-62):
    for a trailing run of zero rows argmax(flip) is its length, and for an
    all-zero input argmax returns 0 => index T-1.
    """
    T = tokens.shape[-1]
    if T == 0:
        # jnp.max over an empty axis raises at trace time; a zero-length
        # read dimension has no defined gather -- fail with the contract,
        # not a reduction error
        raise ValueError("dense semantics requires read length T >= 1")
    pos = jnp.arange(T, dtype=jnp.int32)
    last = jnp.max(jnp.where(tokens != ALPHABET, pos, -1), axis=-1)
    return jnp.where(last < 0, T - 1, last).astype(jnp.int32)


def zero_prefix_state(
    params: BiLSTMParams,
    k: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    compute_dtype=jnp.float32,
):
    """Backward-direction (h, c) after k zero-input steps from zero state.

    The basis of exact length-bucketed batching (BASELINE config 4): under
    dense/ONNX semantics the backward LSTM absorbs every zero row above a
    read's last non-zero base -- max_len-1 down through pads and trailing
    Ns -- and zero-input steps depend only on their COUNT (input projection
    contributes just the bias). So a [B, T_bucket] batch with the backward
    carry initialized to zero_prefix_state(params, max_len - T_bucket)
    reproduces the full [B, max_len] recurrence exactly for every read
    whose tokens fit the bucket (reference semantics:
    ribodetector/model/model_cpu.py:29-37,57-62 with
    seq_encoder.py:130-145 zero padding). All-zero reads are the one
    exception (their gather index is T-1 by the argmax-of-zeros quirk,
    which is bucket-dependent) -- the router sends those to the full
    bucket.

    Returns (h, c), each [1, HIDDEN] in compute_dtype.
    """
    cd = compute_dtype
    gates_x = params.b_b.astype(cd)[None, :]  # zero input row: bias only
    w_hh_b = params.w_hh_b.astype(cd)
    h0 = jnp.zeros((1, params.w_hh_b.shape[0]), cd)

    def step(carry, _):
        h, c = carry
        h, c = _lstm_cell(h, c, gates_x, w_hh_b, precision)
        return (h, c), None

    (h, c), _ = jax.lax.scan(step, (h0, h0), None, length=k)
    return h, c


def _lstm_cell(h, c, gates_x, w_hh, precision):
    """One torch-ordered (i,f,g,o) LSTM cell step.

    gates_x already contains the input projection + bias.
    """
    gates = gates_x + jnp.dot(h, w_hh, precision=precision)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def bilstm_logits(
    params: BiLSTMParams,
    tokens,
    lengths=None,
    *,
    semantics: str = "dense",
    precision=jax.lax.Precision.HIGHEST,
    compute_dtype=jnp.float32,
    bwd_init=None,
):
    """Classify a padded batch of token reads.

    Args:
      params: BiLSTMParams pytree.
      tokens: [B, T] integer tokens in 0..4 (4 = zero row / padding).
      lengths: [B] int32 true lengths; required for semantics="packed".
      semantics: "dense" (ONNX/detect_cpu parity) or "packed" (cuDNN parity).
      precision: matmul precision (HIGHEST for fp32 argmax parity).
      compute_dtype: recurrence dtype (float32 for parity, bfloat16 for speed).
      bwd_init: optional (h, c) [1, HIDDEN] backward-carry init from
        zero_prefix_state -- length-bucketed batching under dense semantics
        (T < max_len stands in for the absorbed zero-pad prefix).

    Returns: [B, 2] logits (class 0 = non-rRNA, 1 = rRNA; quirk #10).
    """
    if semantics not in ("dense", "packed"):
        raise ValueError(f"unknown semantics: {semantics}")
    packed = semantics == "packed"
    if packed and lengths is None:
        raise ValueError("packed semantics requires lengths")
    if packed and bwd_init is not None:
        raise ValueError("bwd_init is a dense-semantics device (packed "
                         "buckets are exact without it)")

    B, T = tokens.shape
    tokens = tokens.astype(jnp.int32)
    cd = compute_dtype

    # Input projection tables with bias folded in: row k<4 = w_ih[k] + b,
    # row 4 (zero input row) = b alone. One gather replaces the [B,4]x[4,512]
    # matmul each step because the input is one-hot by construction.
    gates = params.b_f.shape[0]  # 4*hidden (shape-generic: custom widths)
    hidden = params.w_hh_f.shape[0]
    e_f = jnp.concatenate([params.w_ih_f, jnp.zeros((1, gates), params.w_ih_f.dtype)]) + params.b_f
    e_b = jnp.concatenate([params.w_ih_b, jnp.zeros((1, gates), params.w_ih_b.dtype)]) + params.b_b
    e_f = e_f.astype(cd)
    e_b = e_b.astype(cd)
    w_hh_f = params.w_hh_f.astype(cd)
    w_hh_b = params.w_hh_b.astype(cd)

    if packed:
        lengths = lengths.astype(jnp.int32)
        # clamp to [0, T-1]: a caller-supplied length > T would otherwise
        # never match a capture step and silently return bias-only logits
        # (the encoder clips lengths, but this is a public API)
        gather_idx = jnp.clip(lengths - 1, 0, T - 1)
    else:
        gather_idx = dense_gather_index(tokens)

    h0 = jnp.zeros((B, hidden), cd)
    if bwd_init is not None:
        hb0 = jnp.broadcast_to(bwd_init[0].astype(cd), (B, hidden))
        cb0 = jnp.broadcast_to(bwd_init[1].astype(cd), (B, hidden))
    else:
        hb0, cb0 = h0, h0
    zeros6 = (h0, h0, hb0, cb0, h0, h0)

    # The two directions run in ONE scan: step t advances the forward cell at
    # position t and the backward cell at position T-1-t, capturing each
    # direction's state at its per-read gather position with a masked select.
    xs = (
        tokens.T,  # [T, B] forward tokens
        tokens[:, ::-1].T,  # [T, B] backward tokens
        jnp.arange(T, dtype=jnp.int32),
    )

    def step(carry, x):
        h_f, c_f, h_b, c_b, cap_f, cap_b = carry
        tok_f, tok_b, t = x
        pos_b = T - 1 - t

        h_f_new, c_f_new = _lstm_cell(h_f, c_f, jnp.take(e_f, tok_f, axis=0), w_hh_f, precision)
        h_b_new, c_b_new = _lstm_cell(h_b, c_b, jnp.take(e_b, tok_b, axis=0), w_hh_b, precision)

        if packed:
            # Backward direction starts exactly at the true last base: padding
            # positions (pos >= L) leave the carry untouched (model.py:114-119
            # PackedSequence semantics). Forward may harmlessly run past L-1
            # because its state was already captured there.
            valid_b = (pos_b < lengths)[:, None]
            h_b_new = jnp.where(valid_b, h_b_new, h_b)
            c_b_new = jnp.where(valid_b, c_b_new, c_b)

        cap_f = jnp.where((t == gather_idx)[:, None], h_f_new, cap_f)
        cap_b = jnp.where((pos_b == gather_idx)[:, None], h_b_new, cap_b)
        return (h_f_new, c_f_new, h_b_new, c_b_new, cap_f, cap_b), None

    (_, _, _, _, cap_f, cap_b), _ = jax.lax.scan(step, zeros6, xs)

    last_out = jnp.concatenate([cap_f, cap_b], axis=-1)
    logits = (
        jnp.dot(last_out, params.w_out.astype(cd), precision=precision)
        + params.b_out.astype(cd)
    )
    return logits.astype(jnp.float32)
