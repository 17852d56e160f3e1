"""Pallas fused BiLSTM kernel vs the lax.scan reference.

Runs in interpreter mode on CPU CI; the same kernel is validated on real TPU
hardware by bench.py and was verified to match the CPU scan to ~2e-5 with
100% argmax agreement (see ops/lstm_pallas.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ribodetector_tpu.encode import encode_batch
from ribodetector_tpu.models import bilstm_logits, load_params
from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas
from tests.conftest import random_reads

T = 24


@pytest.fixture(scope="module")
def params(ref_params_path):
    return load_params(ref_params_path)


@pytest.fixture(scope="module")
def batch(rng):
    seqs = random_reads(rng, 10, lmin=5, lmax=T + 10)
    seqs += ["N" * T, "A" * T, "ACG"]
    return encode_batch(seqs, T)


def test_dense_matches_scan(params, batch):
    tokens, _ = batch
    tk = jnp.asarray(tokens)
    ref = np.asarray(bilstm_logits(params, tk, semantics="dense"))
    got = np.asarray(
        bilstm_logits_pallas(params, tk, semantics="dense", matmul="x6", interpret=True)
    )
    assert np.abs(got - ref).max() < 1e-4
    np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))


def test_packed_matches_scan(params, batch):
    tokens, lengths = batch
    tk, ln = jnp.asarray(tokens), jnp.asarray(lengths)
    ref = np.asarray(bilstm_logits(params, tk, ln, semantics="packed"))
    got = np.asarray(
        bilstm_logits_pallas(
            params, tk, ln, semantics="packed", matmul="x6", interpret=True
        )
    )
    assert np.abs(got - ref).max() < 1e-4
    np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))


def test_x3_split_matches_scan_argmax(params, batch):
    """The production default: limb-split matmul + tanh-form sigmoid.
    Validated on real TPU at 4/131072 argmax flips over random-token reads,
    every flip on a read with fp32 logit margin < 1e-3 (the noise class
    where cuDNN and onnxruntime disagree with each other too); here the
    interpret path checks logits stay within that error class and that no
    read with a meaningful margin flips."""
    tokens, lengths = batch
    tk, ln = jnp.asarray(tokens), jnp.asarray(lengths)
    for sem in ("dense", "packed"):
        ref = np.asarray(bilstm_logits(params, tk, ln, semantics=sem))
        got = np.asarray(
            bilstm_logits_pallas(
                params, tk, ln, semantics=sem, matmul="x3", interpret=True
            )
        )
        assert np.abs(got - ref).max() < 1e-2
        flipped = got.argmax(1) != ref.argmax(1)
        margin = np.abs(ref[:, 1] - ref[:, 0])
        assert not flipped[margin >= 5e-3].any()
        # mirror the production parity gate's second clause (bench.py and
        # the runtime probe): total flips bounded too, so a regression that
        # flips many low-margin reads cannot pass this test while the
        # bench gate would reject it
        assert flipped.mean() <= 1e-4


def test_bf16_mode_argmax_concordance(params, batch):
    tokens, _ = batch
    tk = jnp.asarray(tokens)
    ref = np.asarray(bilstm_logits(params, tk, semantics="dense"))
    got = np.asarray(
        bilstm_logits_pallas(
            params,
            tk,
            semantics="dense",
            compute_dtype=jnp.bfloat16,
            precision=jax.lax.Precision.DEFAULT,
            interpret=True,
        )
    )
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.95


def test_ragged_batch_padding(params):
    # batch not divisible by any tile size exercises the pad path
    tokens, lengths = encode_batch(["ACGT" * 3] * 7, T)
    got = np.asarray(
        bilstm_logits_pallas(params, jnp.asarray(tokens), semantics="dense", interpret=True)
    )
    assert got.shape == (7, 2)
    # identical reads -> identical logits incl. the last (padded-tile) row
    np.testing.assert_allclose(got, got[0][None].repeat(7, 0), rtol=0, atol=1e-5)


def test_kernel_contract_guards(params):
    """Entry guards match the scan twin's contract (round-4 review):
    unknown semantics raises (was silently dense), x6 refuses bf16 (was a
    silent single low-precision pass labeled 'exact'), and B=0 returns
    empty logits (was a trace-time crash)."""
    import jax.numpy as jnp

    tokens = np.zeros((8, 12), np.uint8)
    lengths = np.full(8, 12, np.int32)
    with pytest.raises(ValueError, match="unknown semantics"):
        bilstm_logits_pallas(params, tokens, lengths, semantics="Packed",
                             interpret=True)
    with pytest.raises(ValueError, match="float32"):
        bilstm_logits_pallas(params, tokens, lengths, semantics="dense",
                             matmul="x6", compute_dtype=jnp.bfloat16,
                             interpret=True)
    out = bilstm_logits_pallas(params, np.zeros((0, 12), np.uint8),
                               np.zeros(0, np.int32), semantics="dense",
                               interpret=True)
    assert out.shape == (0, 2)


def test_round5_contract_fixes(params):
    """Round-5 review fixes: packed lengths > T clamp to the last step
    (matching the scan twin instead of bias-only logits), x6 refuses
    non-HIGHEST precision, corrupt base-5 bytes decode within the 0..4
    alphabet, and T=0 dense input fails with the contract error."""
    import jax
    import jax.numpy as jnp

    from ribodetector_tpu.models.bilstm import bilstm_logits
    from ribodetector_tpu.ops.dispatch import unpack_b5_tokens

    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 4, (8, 12)).astype(np.uint8)
    over = np.full(8, 99, np.int32)  # lengths far past T
    full = np.full(8, 12, np.int32)
    # clamp semantics: lengths past T behave exactly like length T within
    # the SAME kernel (the old code returned bias-only logits), and agree
    # with the scan twin up to interpret-mode op-ordering noise
    got_over = np.asarray(
        bilstm_logits_pallas(params, tokens, over, semantics="packed",
                             matmul="x6", interpret=True)
    )
    got_full = np.asarray(
        bilstm_logits_pallas(params, tokens, full, semantics="packed",
                             matmul="x6", interpret=True)
    )
    np.testing.assert_array_equal(got_over, got_full)
    want = np.asarray(
        bilstm_logits(params, tokens, over, semantics="packed")
    )
    np.testing.assert_allclose(got_over, want, rtol=0, atol=1e-5)

    with pytest.raises(ValueError, match="HIGHEST"):
        bilstm_logits_pallas(params, tokens, np.full(8, 12, np.int32),
                             semantics="packed", matmul="x6",
                             precision=jax.lax.Precision.DEFAULT,
                             interpret=True)

    corrupt = np.full((4, 5), 255, np.uint8)  # > any valid base-5 byte
    toks = np.asarray(unpack_b5_tokens(jnp.asarray(corrupt), 15))
    assert toks.max() <= 4

    with pytest.raises(ValueError, match="T >= 1"):
        bilstm_logits(params, np.zeros((4, 0), np.uint8), semantics="dense")
