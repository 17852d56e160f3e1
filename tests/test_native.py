"""Native C++ FASTQ parser/encoder vs the portable Python path."""

import gzip
import io

import numpy as np
import pytest

from ribodetector_tpu import native
from ribodetector_tpu.encode import encode_batch
from ribodetector_tpu.io.fastx import seq_parser

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable (no g++)"
)


def make_fastq(seqs):
    return "".join(
        f"@read{i} x\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(seqs)
    ).encode()


def test_tokens_lengths_match_python(rng):
    bases = np.array(list("ACGTUNacgt"))
    seqs = ["".join(rng.choice(bases, size=rng.integers(5, 160))) for _ in range(200)]
    data = make_fastq(seqs)
    offsets, tokens, lengths, clean, consumed = native.parse_fastq_chunk(data, 100)
    assert len(offsets) == 200 and consumed == len(data) and clean.all()
    t_py, l_py = encode_batch(seqs, 100)
    np.testing.assert_array_equal(tokens, t_py)
    np.testing.assert_array_equal(lengths, l_py)


def test_record_slices_are_verbatim():
    data = make_fastq(["ACGT", "GGTT"])
    offsets, *_ = native.parse_fastq_chunk(data, 10)
    rec0 = data[offsets[0, 0] : offsets[0, 1]]
    assert rec0 == b"@read0 x\nACGT\n+\nIIII\n"
    recs = list(seq_parser(io.StringIO(data.decode()), "fastq"))
    assert rec0[:-1].decode() == "\n".join(recs[0])


def test_partial_record_at_buffer_end():
    data = make_fastq(["ACGT", "GGTT"])
    cut = data[:-3]  # cut inside the last record's qual line
    # streaming (more input coming): the partial record stays unconsumed
    offsets, tokens, lengths, clean, consumed = native.parse_fastq_chunk(
        cut, 10, at_eof=False
    )
    assert len(offsets) == 1
    assert consumed == offsets[0, 1]  # resume point after record 0
    # at EOF: an unterminated final QUAL line still finalizes the record
    # (the portable parser yields it -- Python line iteration yields the
    # last unterminated line); a record cut before its 4th line does not
    offsets, _, lengths, clean, consumed = native.parse_fastq_chunk(cut, 10)
    assert len(offsets) == 2 and lengths[1] == 4
    assert clean[1] == 0  # not a verbatim newline-terminated slice
    offsets, *_ = native.parse_fastq_chunk(data[:-8], 10)  # cut before qual
    assert len(offsets) == 1


def test_trailing_blank_lines_at_eof_consumed():
    """Blank/whitespace-only lines after the last record must be consumed
    (the portable parser skips them as empty headers); previously they
    poisoned the stream with a spurious truncation error."""
    data = make_fastq(["ACGT"]) + b"\n  \n\n"
    offsets, _, _, _, consumed = native.parse_fastq_chunk(data, 10)
    assert len(offsets) == 1
    assert consumed == len(data)  # blanks consumed, clean EOF


def test_crlf_records_flagged_dirty():
    data = b"@r0\r\nACGT\r\n+\r\nIIII\r\n@r1\nGGGG\n+\nIIII\n"
    offsets, tokens, lengths, clean, consumed = native.parse_fastq_chunk(data, 10)
    assert list(clean) == [0, 1]
    # sequence still tokenized correctly despite \r
    np.testing.assert_array_equal(tokens[0][:4], [0, 1, 2, 3])
    assert lengths[0] == 4


def test_gather_with_scratch_reuse():
    data = make_fastq(["AAAA", "CCCC", "GGGG"])
    offsets, *_ = native.parse_fastq_chunk(data, 10)
    scratch = bytearray()
    out1 = bytes(native.gather_records(data, offsets, np.array([0, 2]), scratch))
    want = (
        data[offsets[0, 0] : offsets[0, 1]] + data[offsets[2, 0] : offsets[2, 1]]
    )
    assert out1 == want
    out2 = bytes(native.gather_records(data, offsets, np.array([1]), scratch))
    assert out2 == data[offsets[1, 0] : offsets[1, 1]]


def test_b5_packed_parse_matches_unpacked(rng):
    """rd_parse_fastq_b5 packed rows decode to exactly rd_parse_fastq's
    tokens (3 tokens/byte, pad trio byte 124)."""
    bases = np.array(list("ACGTUNacgt"))
    seqs = ["".join(rng.choice(bases, size=rng.integers(5, 160))) for _ in range(150)]
    data = make_fastq(seqs)
    for max_len in (100, 99):  # divisible and non-divisible by 3
        o1, tokens, l1, c1, u1 = native.parse_fastq_chunk(data, max_len)
        o2, packed, l2, c2, u2 = native.parse_fastq_chunk_b5(data, max_len)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(l1, l2)
        assert u1 == u2
        assert packed.shape[1] == native.b5_packed_len(max_len)
        assert packed.max() <= 124
        # decode trios
        trios = packed.astype(np.int32)
        dec = np.stack([trios % 5, (trios // 5) % 5, trios // 25], axis=-1)
        dec = dec.reshape(len(seqs), -1)[:, :max_len].astype(np.uint8)
        np.testing.assert_array_equal(dec, tokens)
        # numpy packer agrees with the native one
        np.testing.assert_array_equal(native.pack_b5(tokens), packed)


def test_unpack_b5_tokens_device_roundtrip(rng):
    import jax.numpy as jnp

    from ribodetector_tpu.ops.dispatch import unpack_b5_tokens

    for T in (100, 101):
        tokens = rng.integers(0, 5, (64, T)).astype(np.uint8)
        packed = native.pack_b5(tokens)
        out = np.asarray(unpack_b5_tokens(jnp.asarray(packed), T))
        np.testing.assert_array_equal(out, tokens)


def test_chunk_stream_multimember_gzip_and_small_caps(tmp_path, rng):
    """The windowed chunk stream: multi-member gzip (pigz/bgzf-style, also
    produced by our own resume part-merge) must decode fully, and tiny
    record caps exercise the window tail-carry path."""
    import gzip as _gzip

    from ribodetector_tpu.runtime.native_pipeline import FastqChunkStream

    seqs = ["".join(rng.choice(list("ACGT"), size=rng.integers(40, 101)))
            for _ in range(101)]
    recs = [f"@m{i}\n{s}\n+\n{'I' * len(s)}\n".encode() for i, s in enumerate(seqs)]
    path = tmp_path / "mm.fq.gz"
    with open(path, "wb") as fh:
        fh.write(_gzip.compress(b"".join(recs[:40])))
        fh.write(_gzip.compress(b"".join(recs[40:])))
    for cap in (7, 1000):
        got = []
        for data, offsets, ptokens, ptokens2, lengths, clean, b2ok, n in FastqChunkStream(
            str(path), 100, cap
        ):
            assert n <= cap
            for i in range(n):
                s, e = offsets[i]
                got.append(bytes(data[s:e]))
        assert got == recs


def test_cli_native_path_crlf_fallback(tmp_path, torch_reference):
    """End-to-end: a CRLF FASTQ goes through the dirty-record fallback and
    still produces the reference partition with rstripped lines."""
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.encode import tokens_to_onehot_np

    dense_logits, _ = torch_reference
    seqs = ["ACGT" * 12, "GGCC" * 12, "TTAA" * 12, "GCGC" * 12]
    raw = "".join(
        f"@p{i}\r\n{s}\r\n+\r\n{'I' * len(s)}\r\n" for i, s in enumerate(seqs)
    )
    inp = tmp_path / "crlf.fq"
    inp.write_text(raw)
    out = tmp_path / "out.fq"
    rr = tmp_path / "rr.fq"
    cli_main(["-l", "48", "-i", str(inp), "-o", str(out), "-r", str(rr), "-m", "3"])
    tokens, _ = encode_batch(seqs, 48)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)
    got_out = out.read_text()
    assert "\r" not in got_out  # rstrip parity with the reference parser
    headers = [l for i, l in enumerate(got_out.splitlines()) if i % 4 == 0]
    assert headers == [f"@p{i}" for i, l in enumerate(labels) if l == 0]


def test_cli_native_gz_roundtrip(tmp_path, torch_reference):
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.encode import tokens_to_onehot_np

    dense_logits, _ = torch_reference
    rng = np.random.default_rng(9)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(300)]
    inp = tmp_path / "in.fq.gz"
    with gzip.open(inp, "wt") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@g{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = tmp_path / "o.fq.gz"
    cli_main(["-l", "60", "-i", str(inp), "-o", str(out), "-m", "3"])
    tokens, _ = encode_batch(seqs, 60)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)
    with gzip.open(out, "rt") as fh:
        headers = [l for i, l in enumerate(fh.read().splitlines()) if i % 4 == 0]
    assert headers == [f"@g{i}" for i, l in enumerate(labels) if l == 0]


# ---------------------------------------------------------------- FASTA


def _fasta_stream_records(path, max_len=100, cap=1000):
    from ribodetector_tpu.runtime.native_pipeline import FastaChunkStream

    recs, toks, lens = [], [], []
    for data, offsets, ptokens, ptokens2, lengths, clean, b2ok, n in FastaChunkStream(
        str(path), max_len, cap
    ):
        assert clean[:n].all()
        for i in range(n):
            s, e = offsets[i]
            recs.append(bytes(data[s:e]).decode())
        toks.append(ptokens[:n].copy())
        lens.append(lengths[:n].copy())
    return recs, np.concatenate(toks) if toks else None, (
        np.concatenate(lens) if lens else None
    )


def test_fasta_stream_normalization_matches_python(tmp_path):
    """Multiline, lowercase, blank lines, CRLF, mid-file empty record,
    trailing empty record (dropped) -- normalized text must equal the
    reference parser's re-emitted records."""
    raw = (
        ">r1 first\nacgt\nACGT\n\n"  # lowercase + multiline + blank
        ">r2\r\nAC GT\r\nnn\r\n"  # CRLF (strip parity); inner space stays
        ">r3_empty\n"  # mid-file record with empty sequence
        ">r4\nTTTT\n"
        ">trailing_empty\n\n"  # trailing empty sequence: dropped
    )
    path = tmp_path / "t.fa"
    path.write_text(raw)
    with open(path) as fh:
        want = list(seq_parser(fh, "fasta"))
    # sanity: the python parser shows the quirks we claim
    assert want[0] == (">r1 first", "ACGTACGT")
    assert want[2] == (">r3_empty", "")
    assert [h for h, _ in want] == [">r1 first", ">r2", ">r3_empty", ">r4"]

    recs, ptoks, lens = _fasta_stream_records(path, max_len=10)
    assert recs == [f"{h}\n{s}\n" for h, s in want]
    # token parity with the portable encoder on the parsed sequences
    from ribodetector_tpu.ops.dispatch import unpack_b5_tokens
    import jax.numpy as jnp

    toks = np.asarray(unpack_b5_tokens(jnp.asarray(ptoks), 10))
    want_toks, want_lens = encode_batch([s for _, s in want], 10)
    np.testing.assert_array_equal(toks, want_toks)
    np.testing.assert_array_equal(lens, want_lens)


def test_fasta_stream_gz_and_small_caps(tmp_path, rng):
    seqs = []
    for i in range(97):
        L = int(rng.integers(30, 200))
        s = "".join(rng.choice(list("ACGTacgtn"), size=L))
        seqs.append(s)
    raw = "".join(
        f">f{i} d\n" + "\n".join(s[j : j + 60] for j in range(0, len(s), 60)) + "\n"
        for i, s in enumerate(seqs)
    )
    path = tmp_path / "m.fa.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(raw)
    for cap in (5, 1000):
        recs, _, lens = _fasta_stream_records(path, max_len=100, cap=cap)
        assert len(recs) == 97
        for i, (r, s) in enumerate(zip(recs, seqs)):
            assert r == f">f{i} d\n{s.upper()}\n"
        np.testing.assert_array_equal(
            lens, np.minimum([len(s) for s in seqs], 100)
        )


def test_cli_native_fasta_end2end(tmp_path, torch_reference):
    """FASTA through the native path: partition matches torch ground truth
    and output records are the reference's normalized form."""
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.encode import tokens_to_onehot_np

    dense_logits, _ = torch_reference
    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(200)]
    inp = tmp_path / "in.fasta"
    with open(inp, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">a{i}\n{s[:30].lower()}\n{s[30:]}\n")
    out = tmp_path / "o.fa"
    rr = tmp_path / "r.fa.gz"
    cli_main(["-l", "60", "-i", str(inp), "-o", str(out), "-r", str(rr), "-m", "3"])
    # ground truth: parser uppercases, so the lowercase half still encodes
    tokens, _ = encode_batch([s.upper() for s in seqs], 60)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)
    lines = out.read_text().splitlines()
    got = {lines[i]: lines[i + 1] for i in range(0, len(lines), 2)}
    want = {f">a{i}": seqs[i] for i, l in enumerate(labels) if l == 0}
    assert got == want
    with gzip.open(rr, "rt") as fh:
        rlines = fh.read().splitlines()
    got_r = {rlines[i]: rlines[i + 1] for i in range(0, len(rlines), 2)}
    assert got_r == {f">a{i}": seqs[i] for i, l in enumerate(labels) if l == 1}
