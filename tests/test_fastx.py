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
