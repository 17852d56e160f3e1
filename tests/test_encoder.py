"""Encoder parity vs the reference BASE_DICT semantics (seq_encoder.py:11-18,126-145)."""

import numpy as np
import pytest

from ribodetector_tpu.encode import PAD_TOKEN, encode_batch, tokens_to_onehot_np

# the reference mapping, restated independently (seq_encoder.py:11-18)
BASE_DICT = {
    "A": (1, 0, 0, 0),
    "C": (0, 1, 0, 0),
    "G": (0, 0, 1, 0),
    "T": (0, 0, 0, 1),
    "U": (0, 0, 0, 1),
}
ZERO = (0, 0, 0, 0)


def ref_encode_variable_len_read(read, max_len):
    """Reimplementation of encode_variable_len_read (seq_encoder.py:130-145)."""
    if len(read) >= max_len:
        return [BASE_DICT.get(b, ZERO) for b in read[:max_len]]
    enc = [ZERO] * max_len
    enc[: len(read)] = [BASE_DICT.get(b, ZERO) for b in read]
    return enc


@pytest.mark.parametrize("max_len", [7, 50, 100])
def test_onehot_matches_reference(rng, max_len):
    bases = np.array(list("ACGTUNacgtRYX"))
    seqs = ["".join(rng.choice(bases, size=rng.integers(0, 2 * max_len))) for _ in range(64)]
    seqs += ["", "N" * max_len, "A" * (max_len + 13), "u" * 5]
    tokens, lengths = encode_batch(seqs, max_len)
    got = tokens_to_onehot_np(tokens)
    want = np.array([ref_encode_variable_len_read(s, max_len) for s in seqs], np.float32)
    np.testing.assert_array_equal(got, want)
    for s, L in zip(seqs, lengths):
        assert L == min(len(s), max_len)


def test_truncation_keeps_first_bases():
    # quirk #3: first max_len bases, not a center crop
    tokens, lengths = encode_batch(["ACGTAAAA"], 4)
    np.testing.assert_array_equal(tokens[0], [0, 1, 2, 3])
    assert lengths[0] == 4


def test_padding_token():
    tokens, _ = encode_batch(["AC"], 5)
    np.testing.assert_array_equal(tokens[0], [0, 1, PAD_TOKEN, PAD_TOKEN, PAD_TOKEN])


def test_empty_batch():
    tokens, lengths = encode_batch([], 10)
    assert tokens.shape == (0, 10) and lengths.shape == (0,)


def test_preallocated_buffer():
    buf = np.full((8, 6), 9, np.uint8)
    tokens, _ = encode_batch(["ACGT", "nn"], 6, out_tokens=buf)
    assert tokens.base is buf or tokens is buf[:2]
    np.testing.assert_array_equal(buf[0], [0, 1, 2, 3, PAD_TOKEN, PAD_TOKEN])
    np.testing.assert_array_equal(buf[1], PAD_TOKEN * np.ones(6, np.uint8))


def test_non_latin1_chars_encode_to_pad_not_crash():
    """A stray codepoint > U+00FF in a sequence must degrade to the pad
    token like every other unknown character (the reference's per-char
    dict maps it to the zero vector), not abort the run with
    UnicodeEncodeError (round-4 review finding)."""
    tokens, lengths = encode_batch(["ACG€T", "AC\U0001F600GT"], 8)
    assert list(lengths) == [5, 5]
    np.testing.assert_array_equal(tokens[0][:5], [0, 1, 2, PAD_TOKEN, 3])
    assert tokens[1][0] == 0 and tokens[1][1] == 1
