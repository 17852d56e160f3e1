"""Differential fuzz: native FASTQ chunk stream vs the portable parser.

Seeded generator produces structurally 4-line FASTQ records with
adversarial content -- empty and huge seqs, lowercase/N/unknown chars,
CRLF and trailing whitespace (dirty-path), '@'-leading quality lines (the
classic FASTQ ambiguity a 4-line state machine must not trip on), '+'
lines with comments, and a gzipped multi-member variant. The native
stream's record count, per-record token rows, lengths, and reconstructed
text must agree with io/fastx.seq_parser + the vectorized encoder
(reference semantics: ribodetector/data_loader/fastx_parser.py:15-27,
seq_encoder.py:126-145).
"""

import gzip
import io as _io

import numpy as np
import pytest

from ribodetector_tpu import native
from ribodetector_tpu.encode import encode_batch
from ribodetector_tpu.io.fastx import seq_parser
from ribodetector_tpu.runtime.native_pipeline import (
    FastqChunkStream,
    records_from_chunk_bytes,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable"
)

MAX_LEN = 80


def _record(rng):
    alphabet = "ACGTUNacgtun Rxyz*"
    ln = int(rng.choice([0, 1, 2, 7, 35, 79, 80, 81, 200, 1000],
                        p=[.05, .05, .1, .2, .2, .1, .1, .1, .05, .05]))
    seq = "".join(rng.choice(list(alphabet), ln)) if ln else ""
    name = "@r" + "".join(rng.choice(list("abc0123456789_ /:"), int(rng.integers(1, 12))))
    plus = rng.choice(["+", "+comment here", "+" + name[1:]])
    # quality of the same length; sometimes begins with '@'
    q = "@" if (ln and rng.random() < 0.3) else "I"
    qual = (q + "J" * (ln - 1)) if ln else ""
    eol = "\r\n" if rng.random() < 0.15 else "\n"
    trail = " " if rng.random() < 0.1 else ""
    return f"{name}{trail}{eol}{seq}{eol}{plus}{eol}{qual}{eol}"


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_stream_matches_portable_parser(tmp_path, seed, gz):
    rng = np.random.default_rng(seed)
    n = 400
    raw = "".join(_record(rng) for _ in range(n)).encode("latin-1")
    path = tmp_path / ("fuzz.fq.gz" if gz else "fuzz.fq")
    if gz:
        # multi-member gzip: two members split mid-stream (pigz/bgzf shape)
        cut = len(raw) // 2
        with open(path, "wb") as fh:
            fh.write(gzip.compress(raw[:cut], 1))
            fh.write(gzip.compress(raw[cut:], 1))
    else:
        path.write_bytes(raw)

    # portable reference: reference-exact record tuples
    want = list(
        seq_parser(_io.TextIOWrapper(_io.BytesIO(raw), encoding="latin-1"), "fastq")
    )
    want_tokens, want_lengths = encode_batch([r[1] for r in want], MAX_LEN)

    got_records = []
    got_tokens = []
    got_lengths = []
    # small chunks + tiny windows force mid-record window carries
    stream = FastqChunkStream(str(path), MAX_LEN, 64, window_bytes=4096)
    for data, offsets, ptokens, ptokens2, lengths, clean, b2ok, cnt in stream:
        text = records_from_chunk_bytes(data, offsets, cnt)
        got_records.extend(text)
        # unpack base-5 rows to compare token content
        p = ptokens[:cnt].astype(np.int32)
        toks = np.stack([p % 5, (p // 5) % 5, p // 25], axis=-1).reshape(cnt, -1)
        got_tokens.append(toks[:, :MAX_LEN])
        got_lengths.extend(int(x) for x in lengths[:cnt])

    assert len(got_records) == len(want)
    for g, w in zip(got_records, want):
        assert g == w
    got_tokens = np.concatenate(got_tokens) if got_tokens else np.zeros((0, MAX_LEN))
    np.testing.assert_array_equal(got_tokens, want_tokens)
    assert got_lengths == [min(len(r[1]), MAX_LEN) for r in want]
