"""End-to-end CLI goldens for --semantics packed (the reference GPU path).

Round-2 gap: packed semantics had model/kernel-level parity tests but the
CLI's packed branch (length staging through the native pipeline,
runtime/native_pipeline.py _route_into's `ln` buffers) had zero e2e
coverage; round 4 adds the bucketed variants (BLEN below). Ground
truth is the torch PackedSequence forward from the official checkpoint
(reference: ribodetector/model/model.py:32-37,114-119) -- the backward
direction starts at each read's true last base, so variable-length reads
give different logits than the dense path and are the interesting case.
"""

import numpy as np
import pytest

from ribodetector_tpu.cli import main as cli_main
from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
from tests.conftest import random_reads
from tests.test_cli_end2end import read_headers, write_fastq

LEN = 60


@pytest.fixture(scope="module")
def packed_golden(rng, torch_reference):
    _, packed_logits = torch_reference
    # variable lengths: the packed-vs-dense divergence is largest for
    # short reads (SURVEY.md 3.4)
    seqs = random_reads(rng, 50, lmin=15, lmax=LEN)
    seqs += ["acgt" * 8, "A" * LEN, "ACGTN" * 6]
    names = [f"q{i}" for i in range(len(seqs))]
    tokens, lengths = encode_batch(seqs, LEN)
    logits = packed_logits(tokens_to_onehot_np(tokens), lengths)
    return names, seqs, logits


def test_packed_single_end_native(tmp_path, packed_golden):
    names, seqs, logits = packed_golden
    labels = logits.argmax(1)
    inp = tmp_path / "in.fq"
    write_fastq(inp, names, seqs)
    out, rrna = tmp_path / "o.fq", tmp_path / "r.fq"
    cli_main(
        ["-l", str(LEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--semantics", "packed", "--kernel", "scan"],
    )
    assert read_headers(out) == [f"@{n}" for n, l in zip(names, labels) if l == 0]
    assert read_headers(rrna) == [f"@{n}" for n, l in zip(names, labels) if l == 1]


# -- packed + BUCKETED (round-4 verdict #2): at -l 128 choose_buckets is
# non-degenerate ([64, 128]), so the default run takes run_bucketed's
# length-staging branch (native_pipeline._route_into fills per-bucket `ln`
# buffers) -- previously untested e2e because LEN=60 made buckets None.

BLEN = 128


def test_buckets_engage_at_blen():
    from ribodetector_tpu.runtime.buckets import choose_buckets

    assert choose_buckets(BLEN, "auto") == [64, BLEN]


def test_packed_bucketed_single_end_native(tmp_path, rng, torch_reference):
    _, packed_logits = torch_reference
    seqs = random_reads(rng, 120, lmin=15, lmax=BLEN)
    seqs += ["acgt" * 20, "A" * BLEN, "ACGTN" * 12, "N" * 50]
    names = [f"bq{i}" for i in range(len(seqs))]
    tokens, lengths = encode_batch(seqs, BLEN)
    labels = packed_logits(tokens_to_onehot_np(tokens), lengths).argmax(1)

    inp = tmp_path / "in.fq"
    write_fastq(inp, names, seqs)
    out, rrna = tmp_path / "o.fq", tmp_path / "r.fq"
    cli_main(
        ["-l", str(BLEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--semantics", "packed", "--kernel", "scan"],
    )
    assert read_headers(out) == [f"@{n}" for n, l in zip(names, labels) if l == 0]
    assert read_headers(rrna) == [f"@{n}" for n, l in zip(names, labels) if l == 1]


@pytest.mark.parametrize("ensure", ["none", "rrna", "norrna", "both"])
def test_packed_bucketed_paired_all_ensure_modes(
    tmp_path, rng, torch_reference, ensure
):
    """Paired packed+bucketed: mates route by the pair's larger bucket, so
    mixed-length pairs (one mate <= 64, the other > 64) exercise the
    cross-bucket staging; golden = torch PackedSequence logits
    (reference: ribodetector/model/model.py:114-119)."""
    _, packed_logits = torch_reference
    n = 60
    # force many cross-bucket pairs: R1 short, R2 spanning both buckets
    seqs1 = random_reads(rng, n, lmin=15, lmax=64)
    seqs2 = random_reads(rng, n, lmin=40, lmax=BLEN)
    names = [f"bp{i}" for i in range(n)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)

    t1, len1 = encode_batch(seqs1, BLEN)
    t2, len2 = encode_batch(seqs2, BLEN)
    l1 = packed_logits(tokens_to_onehot_np(t1), len1)
    l2 = packed_logits(tokens_to_onehot_np(t2), len2)
    a1, a2 = l1.argmax(1), l2.argmax(1)
    if ensure == "rrna":
        want = np.where((a1 == 1) & (a2 == 1), 1, 0)
    elif ensure == "norrna":
        want = np.where((a1 == 0) & (a2 == 0), 0, 1)
    elif ensure == "both":
        want = np.where(a1 == a2, a1, -1)
    else:
        want = (l1 + l2).argmax(1)  # quirk #4: raw logit sum

    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    rr1, rr2 = tmp_path / "rr1.fq", tmp_path / "rr2.fq"
    cli_main(
        ["-l", str(BLEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-e", ensure, "-m", "3", "--chunk_size", "2",
         "--semantics", "packed", "--kernel", "scan"],
    )
    for out, rr, unclf in ((out1, rr1, str(out1) + ".unclassified.gz"),
                           (out2, rr2, str(out2) + ".unclassified.gz")):
        assert read_headers(out) == [f"@{n}" for n, l in zip(names, want) if l == 0]
        assert read_headers(rr) == [f"@{n}" for n, l in zip(names, want) if l == 1]
        if ensure == "both":
            assert read_headers(unclf) == [
                f"@{n}" for n, l in zip(names, want) if l == -1
            ]


@pytest.mark.parametrize("ensure", ["none", "rrna", "norrna", "both"])
def test_packed_paired_all_ensure_modes(tmp_path, rng, torch_reference, ensure):
    _, packed_logits = torch_reference
    n = 40
    seqs1 = random_reads(rng, n, lmin=15, lmax=LEN)
    seqs2 = random_reads(rng, n, lmin=15, lmax=LEN)
    names = [f"pp{i}" for i in range(n)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)

    t1, len1 = encode_batch(seqs1, LEN)
    t2, len2 = encode_batch(seqs2, LEN)
    l1 = packed_logits(tokens_to_onehot_np(t1), len1)
    l2 = packed_logits(tokens_to_onehot_np(t2), len2)
    a1, a2 = l1.argmax(1), l2.argmax(1)
    if ensure == "rrna":
        want = np.where((a1 == 1) & (a2 == 1), 1, 0)
    elif ensure == "norrna":
        want = np.where((a1 == 0) & (a2 == 0), 0, 1)
    elif ensure == "both":
        want = np.where(a1 == a2, a1, -1)
    else:
        want = (l1 + l2).argmax(1)  # quirk #4: raw logit sum

    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    rr1, rr2 = tmp_path / "rr1.fq", tmp_path / "rr2.fq"
    cli_main(
        ["-l", str(LEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-e", ensure, "-m", "3", "--chunk_size", "2",
         "--semantics", "packed", "--kernel", "scan"],
    )
    for out, rr, unclf in ((out1, rr1, str(out1) + ".unclassified.gz"),
                           (out2, rr2, str(out2) + ".unclassified.gz")):
        assert read_headers(out) == [f"@{n}" for n, l in zip(names, want) if l == 0]
        assert read_headers(rr) == [f"@{n}" for n, l in zip(names, want) if l == 1]
        if ensure == "both":
            assert read_headers(unclf) == [
                f"@{n}" for n, l in zip(names, want) if l == -1
            ]
