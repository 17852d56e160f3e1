"""Golden parity: JAX BiLSTM vs the reference torch checkpoint.

Covers both gather semantics (SURVEY.md 3.4): dense (ONNX/detect_cpu path)
and packed (cuDNN PackedSequence path), on reads with N bases, lowercase
bases, and variable lengths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
from ribodetector_tpu.models import load_params, bilstm_logits, dense_gather_index
from tests.conftest import random_reads


@pytest.fixture(scope="module")
def params(ref_params_path):
    return load_params(ref_params_path)


@pytest.fixture(scope="module")
def batch(rng):
    seqs = random_reads(rng, 48)
    seqs += ["N" * 50, "A" * 100, "ACGT", "acgtacgtacgt", "ACGTN" * 10]
    tokens, lengths = encode_batch(seqs, 100)
    return tokens, lengths


def test_dense_semantics_matches_torch(params, batch, torch_reference):
    tokens, lengths = batch
    dense_logits, _ = torch_reference
    want = dense_logits(tokens_to_onehot_np(tokens))
    got = np.asarray(
        jax.jit(lambda t: bilstm_logits(params, t, semantics="dense"))(
            jnp.asarray(tokens)
        )
    )
    assert np.abs(got - want).max() < 5e-3
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


def test_packed_semantics_matches_torch(params, batch, torch_reference):
    tokens, lengths = batch
    _, packed_logits = torch_reference
    want = packed_logits(tokens_to_onehot_np(tokens), lengths)
    got = np.asarray(
        jax.jit(lambda t, l: bilstm_logits(params, t, l, semantics="packed"))(
            jnp.asarray(tokens), jnp.asarray(lengths)
        )
    )
    assert np.abs(got - want).max() < 5e-3
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


def test_dense_gather_index_quirks():
    # trailing Ns gather at last ACGT base; all-N reads gather at T-1
    # (np.argmax-of-zeros quirk, model_cpu.py:57-62)
    tokens, _ = encode_batch(["ACGTNN", "NNNNNN", "NACGTN", "ACGTAC"], 6)
    idx = np.asarray(dense_gather_index(jnp.asarray(tokens)))
    np.testing.assert_array_equal(idx, [3, 5, 4, 5])


def test_semantics_differ_on_padded_reads(params):
    # the two paths are NOT bit-identical for short reads (SURVEY.md 3.4)
    tokens, lengths = encode_batch(["ACGTACGTAC"], 100)
    ld = bilstm_logits(params, jnp.asarray(tokens), semantics="dense")
    lp = bilstm_logits(
        params, jnp.asarray(tokens), jnp.asarray(lengths), semantics="packed"
    )
    assert float(jnp.abs(ld - lp).max()) > 1e-4


def test_bfloat16_mode_agrees_at_argmax(params, batch):
    tokens, _ = batch
    f32 = bilstm_logits(params, jnp.asarray(tokens), semantics="dense")
    bf16 = bilstm_logits(
        params,
        jnp.asarray(tokens),
        semantics="dense",
        compute_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
    )
    match = (np.asarray(f32).argmax(1) == np.asarray(bf16).argmax(1)).mean()
    assert match > 0.95


@pytest.mark.parametrize("hidden", [64, 256])
def test_custom_hidden_width_scan_matches_torch(rng, hidden):
    """The engine accepts custom-width checkpoints (the reference's config
    arch args allow hidden_size != 128 for retrained models): the scan
    path is shape-generic and must match a torch nn.LSTM of that width;
    kernel='auto' must route such params to scan, and kernel='pallas' must
    refuse them with a clear error."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    import jax
    import jax.numpy as jnp

    from ribodetector_tpu.models.bilstm import init_params
    from ribodetector_tpu.models.convert import arrays_to_state_dict
    from ribodetector_tpu.ops import classify_logits

    params = init_params(jax.random.PRNGKey(1), hidden=hidden)
    model = nn.LSTM(4, hidden, 1, batch_first=True, bidirectional=True)
    head = nn.Linear(2 * hidden, 2)
    sd = arrays_to_state_dict(params)
    model.load_state_dict(
        {k[4:]: torch.from_numpy(v) for k, v in sd.items() if k.startswith("rnn.")}
    )
    head.load_state_dict(
        {k[4:]: torch.from_numpy(v) for k, v in sd.items() if k.startswith("out.")}
    )
    model.eval(), head.eval()

    from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
    from tests.conftest import random_reads

    seqs = random_reads(rng, 24, lmin=10, lmax=50)
    tokens, lengths = encode_batch(seqs, 50)
    x = torch.from_numpy(tokens_to_onehot_np(tokens))
    with torch.no_grad():
        r_out, _ = model(x)
        g = x.size(1) - 1 - x.sum(2).flip(1).argmax(1)
        want = head(r_out[torch.arange(x.size(0)), g, :]).numpy()

    got = np.asarray(
        classify_logits(params, jnp.asarray(tokens), semantics="dense",
                        kernel="auto")
    )
    np.testing.assert_allclose(got, want, atol=3e-5)
    with pytest.raises(ValueError, match="hidden width 128"):
        classify_logits(params, jnp.asarray(tokens), semantics="dense",
                        kernel="pallas")


def test_init_params_head_independent_and_torch_bounds():
    """The head weights must be an independent draw (key was previously
    reused: w_out duplicated the first 512 values of w_ih_f) with torch
    nn.Linear's fan-in bound 1/sqrt(2*hidden), bias uniform not zeros."""
    import jax

    from ribodetector_tpu.models.bilstm import init_params

    p = init_params(jax.random.PRNGKey(0))
    assert not np.array_equal(
        np.asarray(p.w_out).ravel()[:512], np.asarray(p.w_ih_f).ravel()[:512]
    )
    hb = 1.0 / np.sqrt(256)
    assert np.abs(np.asarray(p.w_out)).max() <= hb
    assert np.abs(np.asarray(p.b_out)).max() <= hb
    assert np.abs(np.asarray(p.b_out)).max() > 0  # uniform, not zeroed


def test_packed_lengths_clamped_to_T(rng, params):
    """A caller-supplied length > T (or <= 0) must clamp to the matrix,
    not silently return bias-only logits (round-4 review finding)."""
    import jax.numpy as jnp

    from ribodetector_tpu.models.bilstm import bilstm_logits

    tokens, _ = encode_batch(["ACGTACGTAC"], 10)
    over = np.asarray(
        bilstm_logits(params, jnp.asarray(tokens),
                      jnp.asarray([11], jnp.int32), semantics="packed")
    )
    exact = np.asarray(
        bilstm_logits(params, jnp.asarray(tokens),
                      jnp.asarray([10], jnp.int32), semantics="packed")
    )
    np.testing.assert_allclose(over, exact, atol=1e-6)
    assert not np.allclose(over, np.asarray(params.b_out)[None, :])
