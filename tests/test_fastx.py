"""Parser + format-sniffing parity tests (reference: fastx_parser.py, seq_encoder.py:21-39)."""

import gzip
import io

import pytest

from ribodetector_tpu.io import get_seq_format, seq_parser, parse_file, load_reads

FASTQ = "@r1\nACGTacgtN\n+\nIIIIIIIII\n@r2 desc\nTTTT\n+ opt\n!!!!\n"
FASTA = ">s1 first\nacgt\nACGT\n\n>s2\nNNNN\n"


def test_fastq_records():
    recs = list(seq_parser(io.StringIO(FASTQ), "fastq"))
    assert recs == [
        ("@r1", "ACGTacgtN", "+", "IIIIIIIII"),
        ("@r2 desc", "TTTT", "+ opt", "!!!!"),
    ]


def test_fastq_not_uppercased():
    # quirk #1: FASTQ sequences pass through verbatim (fastx_parser.py:26-27)
    recs = list(seq_parser(io.StringIO("@x\nacgt\n+\nIIII\n"), "fastq"))
    assert recs[0][1] == "acgt"


def test_fasta_multiline_uppercased():
    recs = list(seq_parser(io.StringIO(FASTA), "fasta"))
    # FASTA is uppercased and joined across lines (fastx_parser.py:53)
    assert recs == [(">s1 first", "ACGTACGT"), (">s2", "NNNN")]


def test_fasta_empty_final_record_dropped():
    recs = list(seq_parser(io.StringIO(">a\nACGT\n>b\n"), "fasta"))
    assert recs == [(">a", "ACGT")]


def test_fastq_truncated_record_raises():
    with pytest.raises(ValueError, match="Truncated"):
        list(seq_parser(io.StringIO("@r1\nACGT\n+\n"), "fastq"))


@pytest.mark.parametrize(
    "name,expected",
    [
        ("x.fq", "fq"),
        ("x.fastq", "fq"),
        ("x.fastq.gz", "fqgz"),
        ("x.fa", "fa"),
        ("x.fasta", "fa"),
        ("x.fna.gz", "fagz"),
        ("x.fas", "fa"),
    ],
)
def test_get_seq_format(name, expected):
    assert get_seq_format(name) == expected


def test_get_seq_format_rejects_unknown_ext():
    with pytest.raises(ValueError, match="Unknown extension"):
        get_seq_format("reads.txt")


def test_get_seq_format_rejects_unknown_encoding():
    with pytest.raises(ValueError, match="Unknown file encoding"):
        get_seq_format("reads.fq.bz2")


def test_parse_gzip_roundtrip(tmp_path):
    p = tmp_path / "reads.fq.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(FASTQ)
    recs = list(parse_file(str(p)))
    assert len(recs) == 2 and recs[0][1] == "ACGTacgtN"
    assert load_reads(str(p)) == recs


def test_native_yields_final_record_without_trailing_newline(tmp_path):
    """A FASTQ file whose last record lacks the trailing newline must still
    classify that record (the portable parser yields it; the native window
    loop appends one newline at EOF -- round-4 review finding)."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    recs = "".join(f"@n{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(50))
    inp = tmp_path / "in.fq"
    inp.write_bytes(recs.encode() + b"@last\nACGTACGT\n+\nIIIIIIII")  # no \n
    cli_main(["-l", "8", "-i", str(inp), "-o", str(tmp_path / "o.fq"),
              "-r", str(tmp_path / "r.fq"), "-m", "3", "--chunk_size", "1",
              "--kernel", "scan"])
    headers = [l for f in ("o.fq", "r.fq")
               for l in (tmp_path / f).read_text().splitlines()[::4]]
    assert len(headers) == 51 and "@last" in headers


def test_native_truncated_plain_fastq_raises(tmp_path):
    """A plain FASTQ cut off mid-record must raise like the portable parser
    (io/fastx.py ValueError), not silently drop the partial record."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    recs = "".join(f"@t{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(50))
    inp = tmp_path / "in.fq"
    inp.write_bytes(recs.encode() + b"@cut\nACGTAC")  # header+seq only
    with pytest.raises(ValueError, match="Truncated FASTQ record"):
        cli_main(["-l", "8", "-i", str(inp), "-o", str(tmp_path / "o.fq"),
                  "-m", "3", "--chunk_size", "1", "--kernel", "scan"])


def test_giant_record_retry_reuses_slot_differential(tmp_path):
    """A record vastly larger than the adaptive size estimate forces
    consecutive n==0 window retries; the retry path must reuse ONE slot
    (not march through the pool over windows pinned by in-flight
    accumulators -- round-4 review finding). Differential: outputs must
    equal the portable engine byte-for-byte."""
    import json

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.config import DEFAULT_CONFIG

    if not native.available():
        pytest.skip("native extension unavailable")
    import numpy as np

    rng = np.random.default_rng(47)
    giant = "".join(rng.choice(list("ACGT"), size=150_000))
    with open(tmp_path / "in.fq", "w") as fh:
        for i in range(3000):
            fh.write(f"@s{i}\n{'ACGT' * 15}\n+\n{'I' * 60}\n")
            if i in (1000, 1001, 2000):  # giants mid-stream, after the EMA
                fh.write(f"@g{i}\n{giant}\n+\n{'I' * len(giant)}\n")

    cfg = json.load(open(DEFAULT_CONFIG))
    cfg.setdefault("runtime", {})["native"] = False
    json.dump(cfg, open(tmp_path / "port.json", "w"))

    for tag, extra in (("nat", []), ("port", ["-c", str(tmp_path / "port.json")])):
        cli_main(["-l", "100", "-i", str(tmp_path / "in.fq"),
                  "-o", str(tmp_path / f"{tag}.fq"),
                  "-r", str(tmp_path / f"{tag}r.fq"),
                  "-m", "3", "--chunk_size", "1", "--kernel", "scan", *extra])
    assert (tmp_path / "nat.fq").read_bytes() == (tmp_path / "port.fq").read_bytes()
    assert (tmp_path / "natr.fq").read_bytes() == (tmp_path / "portr.fq").read_bytes()


def test_trailing_blank_lines_via_cli(tmp_path):
    """FASTQ ending in blank/whitespace-only lines is valid input (the
    portable parser skips them); previously the native stream raised a
    spurious Truncated error after yielding every real record."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    recs = "".join(f"@b{i}\nACGTACGT\n+\nIIIIIIII\n" for i in range(40))
    inp = tmp_path / "in.fq"
    inp.write_bytes(recs.encode() + b"\n \n\n")
    cli_main(["-l", "8", "-i", str(inp), "-o", str(tmp_path / "o.fq"),
              "-r", str(tmp_path / "r.fq"), "-m", "3", "--chunk_size", "1",
              "--kernel", "scan"])
    n = sum(1 for f in ("o.fq", "r.fq")
            for l in (tmp_path / f).read_text().splitlines()[::4] if l)
    assert n == 40


def test_lone_cr_line_endings_fail_loudly(tmp_path):
    """Classic-Mac lone-CR files are not supported by the native parser:
    they must raise a clear error with a workaround, never silently drop
    records (FASTA previously parsed 0 records silently)."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    (tmp_path / "in.fa").write_bytes(b">r1\rACGTACGT\r>r2\rGGGGTTTT\r")
    with pytest.raises(ValueError, match="lone-CR"):
        cli_main(["-l", "8", "-i", str(tmp_path / "in.fa"),
                  "-o", str(tmp_path / "o.fa"), "-m", "3",
                  "--chunk_size", "1", "--kernel", "scan"])
    (tmp_path / "in.fq").write_bytes(b"@r1\rACGT\r+\rIIII\r")
    with pytest.raises(ValueError, match="lone-CR"):
        cli_main(["-l", "8", "-i", str(tmp_path / "in.fq"),
                  "-o", str(tmp_path / "o.fq"), "-m", "3",
                  "--chunk_size", "1", "--kernel", "scan"])


def test_gzip_suffix_rejected_like_reference(tmp_path):
    """Parity quirk: '.gzip' is rejected (mimetypes has no entry for it)
    even though the guidance text mentions it -- the reference's identical
    guess_type call behaves the same way."""
    from ribodetector_tpu.io.format import get_seq_format

    with pytest.raises(ValueError):
        get_seq_format("reads.fq.gzip")
    assert get_seq_format("reads.fq.gz") == "fqgz"


def test_fasta_preheader_and_headerless_reference_parity(tmp_path):
    """Reference quirks for malformed FASTA (fastx_parser.py:38-55):
    sequence lines BEFORE the first '>' prepend to record 1, and a
    headerless file yields one ('', seq) record at EOF."""
    import io

    from ribodetector_tpu.io.fastx import seq_parser

    recs = list(seq_parser(io.StringIO("ACGT\n>h1\ngggg\n>h2\nTT\n"), "fasta"))
    assert recs == [(">h1", "ACGTGGGG"), (">h2", "TT")]

    recs = list(seq_parser(io.StringIO("acgt\nACGT\n"), "fasta"))
    assert recs == [("", "ACGTACGT")]

    # empty file / header-only file stay empty
    assert list(seq_parser(io.StringIO(""), "fasta")) == []
    assert list(seq_parser(io.StringIO(">only\n"), "fasta")) == []


def test_portable_open_is_latin1(tmp_path):
    """Input files are byte streams: a latin-1 byte (0xE9) in a header
    must parse on the portable path regardless of locale, one byte = one
    char (matching the native path's fixed byte semantics)."""
    from ribodetector_tpu.io.fastx import parse_file

    raw = b"@r\xe9ad1\nAC\xe9GT\n+\nIIIII\n"
    p = tmp_path / "l1.fq"
    p.write_bytes(raw)
    (rec,) = list(parse_file(str(p)))
    assert rec[0] == "@r\xe9ad1" and len(rec[1]) == 5

    # eager validation: a bad extension errors at call time
    import pytest as _pytest

    bad = tmp_path / "x.bz2"
    bad.write_bytes(b"")
    with _pytest.raises(ValueError):
        parse_file(str(bad))
