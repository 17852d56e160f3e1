"""Vectorized read encoding: bytes -> small integer tokens.

The reference one-hot encodes with a per-base Python dict lookup
(reference: ribodetector/data_loader/seq_encoder.py:11-18,126-145) -- its #1
hot loop (SURVEY.md 3.5). Here reads are encoded on the host to compact
``uint8`` token arrays with a 256-entry LUT (one vectorized numpy gather per
batch); the 4-wide one-hot expansion happens **on device** inside the model
(a [B,4] one-hot is 32x larger than the token array, so shipping tokens also
cuts host->device transfer 4x vs fp32 one-hot by 16x).

Token alphabet (encodes the exact BASE_DICT semantics, seq_encoder.py:11-18):

    A->0  C->1  G->2  T->3  U->3  everything else (N, lowercase, ...) -> 4

Token 4 one-hots to the zero vector (matching ZERO_LIST), and is also the
padding token, since the reference pads with zero vectors
(seq_encoder.py:142-144). Truncation keeps the FIRST max_len bases
(quirk #3; detect.py:682, seq_encoder.py:137-138).
"""

import numpy as np

PAD_TOKEN = np.uint8(4)

# 256-entry byte -> token LUT. Uppercase ACGT/U only: lowercase intentionally
# maps to 4 (zero vector) because FASTQ sequences are not uppercased by the
# parser (fastx_parser.py:26-27, quirk #1).
TOKEN_LUT = np.full(256, PAD_TOKEN, dtype=np.uint8)
TOKEN_LUT[ord("A")] = 0
TOKEN_LUT[ord("C")] = 1
TOKEN_LUT[ord("G")] = 2
TOKEN_LUT[ord("T")] = 3
TOKEN_LUT[ord("U")] = 3

# one-hot table indexed by token: rows 0..3 are unit vectors, row 4 is zeros.
ONEHOT_TABLE = np.zeros((5, 4), dtype=np.float32)
ONEHOT_TABLE[:4] = np.eye(4, dtype=np.float32)


def encode_batch(seqs, max_len, out_tokens=None):
    """Encode a batch of read strings to a dense token matrix.

    Args:
      seqs: sequence strings (ASCII).
      max_len: pad/truncate length T.
      out_tokens: optional preallocated [>=B, T] uint8 buffer to fill.

    Returns:
      tokens: [B, T] uint8, padded with PAD_TOKEN.
      lengths: [B] int32 true lengths clipped to max_len (used by the
        packed-semantics forward; the dense/ONNX forward derives its gather
        index from the tokens themselves).
    """
    n = len(seqs)
    if n == 0:
        return np.empty((0, max_len), np.uint8), np.empty((0,), np.int32)

    full_lens = np.fromiter((len(s) for s in seqs), count=n, dtype=np.int64)
    lengths = np.minimum(full_lens, max_len).astype(np.int32)

    # One C-speed join + one frombuffer, then a single vectorized gather.
    # A max_len run of pad bytes is appended so out-of-range gathers read
    # PAD-encoding bytes instead of needing a masked index build.
    buf = np.frombuffer(
        ("".join(seqs) + "\0" * max_len).encode("latin-1", "replace"),
        dtype=np.uint8
    )
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(full_lens[:-1], out=starts[1:])

    col = np.arange(max_len, dtype=np.int64)
    valid = col[None, :] < lengths[:, None]
    idx = starts[:, None] + col[None, :]
    gathered = TOKEN_LUT[buf[idx]]
    if out_tokens is not None:
        # fill + masked copy: one pass over the buffer instead of a
        # boolean-inverse temp plus a fancy-assign re-writing pads the
        # caller had typically pre-filled anyway
        tokens = out_tokens[:n]
        tokens.fill(PAD_TOKEN)
        np.copyto(tokens, gathered, where=valid)
    else:
        tokens = np.where(valid, gathered, PAD_TOKEN)
    return tokens, lengths


def tokens_to_onehot_np(tokens):
    """[B, T] uint8 tokens -> [B, T, 4] float32 one-hot (host-side reference).

    Matches encode_variable_len_read output exactly (seq_encoder.py:130-145).
    """
    return ONEHOT_TABLE[tokens]
