"""Paired-end alignment under adversarial record-size distributions.

Round-2 regression: the native chunk streams are byte-window-adaptive, so a
mid-file shift in record size makes a stream yield short chunks (n < cap);
zipping chunks per side and truncating to min(n1, n2) then silently dropped
the longer chunk's tail rows and desynchronized the pair streams. The fix
(_RecordCursor in runtime/native_pipeline.py) keeps a record-exact cursor
per file. These tests pin: no read lost, sides pair-aligned, labels equal to
the torch reference, for FASTQ and FASTA, single-host and --hosts 2.
Reference behavior preserved: truncation to the shorter file happens at file
end only (reference: ribodetector/data_loader/seq_encoder.py:90-92).
"""

import numpy as np
import pytest

from ribodetector_tpu.cli import main as cli_main
from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
from tests.test_cli_end2end import read_headers, write_fastq

LEN = 100
N = 6000  # 3000 short then 3000 long R1 records defeat the adaptive window


def _mixed_seqs():
    """R1 flips from 30bp to 240bp mid-file (the adaptive fill target
    tracks the small records, so the first long-record window underfills);
    R2 stays uniform 30bp."""
    base = "ACGTTGCA" * 30
    seqs1 = [base[: (30 if i < N // 2 else 240)] for i in range(N)]
    seqs2 = [base[7:37] for _ in range(N)]
    return seqs1, seqs2


@pytest.fixture(scope="module")
def mixed_golden(torch_reference):
    """ensure=none pair labels from the torch dense reference."""
    dense_logits, _ = torch_reference
    seqs1, seqs2 = _mixed_seqs()
    t1, _ = encode_batch(seqs1, LEN)
    t2, _ = encode_batch(seqs2, LEN)
    l1 = dense_logits(tokens_to_onehot_np(t1))
    l2 = dense_logits(tokens_to_onehot_np(t2))
    return (l1 + l2).argmax(1)  # quirk #4: raw logit sum


def _check_outputs(out1, out2, rr1, rr2, names, want):
    got_o1, got_o2 = read_headers(out1), read_headers(out2)
    got_r1, got_r2 = read_headers(rr1), read_headers(rr2)
    # sides pair-aligned in every bucket
    assert got_o1 == got_o2
    assert got_r1 == got_r2
    # nothing lost, nothing duplicated
    assert len(got_o1) + len(got_r1) == len(names)
    # exact partition + input order vs the torch reference
    assert got_o1 == [f"@{n}" for n, l in zip(names, want) if l == 0]
    assert got_r1 == [f"@{n}" for n, l in zip(names, want) if l == 1]


def test_paired_fastq_mixed_record_sizes(tmp_path, mixed_golden):
    seqs1, seqs2 = _mixed_seqs()
    names = [f"m{i}" for i in range(N)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)
    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    rr1, rr2 = tmp_path / "rr1.fq", tmp_path / "rr2.fq"
    # -m 4 paired -> batch 1024: small enough that the 30bp->240bp flip
    # lands mid-stream and forces underfilled chunks (verified to repro the
    # round-2 loss: 5650/6000 under the old min(n1, n2) zipping)
    cli_main(
        ["-l", str(LEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-m", "4", "--chunk_size", "1",
         "--kernel", "scan"],
    )
    _check_outputs(out1, out2, rr1, rr2, names, mixed_golden)


def test_paired_fasta_mixed_record_sizes(tmp_path, mixed_golden):
    seqs1, seqs2 = _mixed_seqs()
    names = [f"m{i}" for i in range(N)]
    in1, in2 = tmp_path / "r1.fa", tmp_path / "r2.fa"
    for path, seqs in ((in1, seqs1), (in2, seqs2)):
        with open(path, "w") as fh:
            for n, s in zip(names, seqs):
                fh.write(f">{n}\n{s}\n")
    out1, out2 = tmp_path / "o1.fa", tmp_path / "o2.fa"
    rr1, rr2 = tmp_path / "rr1.fa", tmp_path / "rr2.fa"
    cli_main(
        ["-l", str(LEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-m", "4", "--chunk_size", "1",
         "--kernel", "scan"],
    )

    def fa_headers(path):
        with open(path) as fh:
            return [l.strip() for l in fh if l.startswith(">")]

    got_o1, got_o2 = fa_headers(out1), fa_headers(out2)
    got_r1, got_r2 = fa_headers(rr1), fa_headers(rr2)
    assert got_o1 == got_o2 and got_r1 == got_r2
    assert got_o1 == [f">{n}" for n, l in zip(names, mixed_golden) if l == 0]
    assert got_r1 == [f">{n}" for n, l in zip(names, mixed_golden) if l == 1]


def test_paired_mixed_sizes_hosts2(tmp_path, mixed_golden):
    """--hosts 2: each host's shard must hold exactly its logical chunks'
    pairs (record-exact, so the union is the full file and both sides
    align), even with adversarial record sizes."""
    seqs1, seqs2 = _mixed_seqs()
    names = [f"m{i}" for i in range(N)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)
    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    for hid in (0, 1):
        cli_main(
            ["-l", str(LEN), "-i", str(in1), str(in2),
             "-o", str(out1), str(out2), "-m", "4", "--chunk_size", "1",
             "--kernel", "scan", "--hosts", "2", "--host-id", str(hid)],
        )
    rpc = 1024  # batch 1024 * chunk_size 1
    want = mixed_golden
    for side, out in ((0, out1), (1, out2)):
        shards = sorted(out.parent.glob(out.name + ".host*"))
        assert len(shards) == 2
        per_host = [read_headers(s) for s in shards]
        # shard h = the norrna reads of logical chunks h, h+2, h+4, ...
        for h, got in enumerate(per_host):
            want_h = [
                f"@{n}"
                for i, (n, l) in enumerate(zip(names, want))
                if l == 0 and (i // rpc) % 2 == h
            ]
            assert got == want_h
        # merged shards = exactly the single-host partition (as a set; the
        # user concatenates in chunk order)
        merged = sorted(per_host[0] + per_host[1])
        assert merged == sorted(f"@{n}" for n, l in zip(names, want) if l == 0)


def test_record_cursor_skip_is_record_exact(tmp_path):
    """cursor.skip(k) lands exactly k records in, across window boundaries
    (the --resume restart path for paired inputs relies on this)."""
    from ribodetector_tpu.runtime.native_pipeline import (
        FastqChunkStream,
        _Prefetcher,
        _RecordCursor,
    )

    seqs1, _ = _mixed_seqs()
    names = [f"m{i}" for i in range(N)]
    path = tmp_path / "r1.fq"
    write_fastq(path, names, seqs1)
    for skip in (0, 1, 1024, 3000, 4097, N - 1, N, N + 5):
        cur = _RecordCursor(
            _Prefetcher(iter(FastqChunkStream(str(path), LEN, 1024)), depth=1)
        )
        assert cur.skip(skip) == min(skip, N)
        got = 0
        while cur.ready():
            got += cur.take(cur.chunk_avail())[1].shape[0]
        assert got == N - min(skip, N)
