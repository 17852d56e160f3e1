"""Bucketed runs on giant records: the window-span bound.

The bucketed runner defers byte-gather writes to accumulator completion,
pinning every parse window an accumulator spans. The chunk streams recycle
window slots after depth+prefetch+3 yields, so a logical chunk of records
much larger than the ~280 B sizing estimate (long-contig FASTA) can span
more windows than the pool holds -- without the _ChunkAcc.MAX_WINDOWS
split, the producer overwrites a window whose write is still pending and
the output records silently corrupt. This test uses ~120 KB records so one
1024-record chunk spans ~18 windows (> the 12-slot pool) and verifies
every output record passes through byte-intact with the right partition.
"""

import numpy as np
import pytest

from ribodetector_tpu import native
from ribodetector_tpu.cli import main as cli_main
from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable"
)

LEN = 100
N = 1200
REC = 120_000  # bases per record


def test_giant_fasta_records_survive_window_recycling(tmp_path, rng, torch_reference):
    dense_logits, _ = torch_reference
    lut = np.frombuffer(b"ACGT", np.uint8)
    seqs = [
        lut[rng.integers(0, 4, REC)].tobytes().decode() for _ in range(N)
    ]
    inp = tmp_path / "contigs.fa"
    with open(inp, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">c{i}\n{s}\n")

    # golden labels from the first LEN bases (quirk #3 truncation)
    tokens, _ = encode_batch([s[:LEN] for s in seqs], LEN)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)

    out, rrna = tmp_path / "o.fa", tmp_path / "r.fa"
    cli_main(
        ["-l", str(LEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--chunk_size", "1", "--kernel", "scan",
         "--buckets", "auto"],
    )

    def records(path):
        got = {}
        with open(path) as fh:
            name = None
            for line in fh:
                if line.startswith(">"):
                    name = line[1:].strip()
                else:
                    got[name] = line.strip()
        return got

    got_o, got_r = records(out), records(rrna)
    assert len(got_o) + len(got_r) == N
    for i, s in enumerate(seqs):
        bucket = got_o if labels[i] == 0 else got_r
        assert f"c{i}" in bucket, f"record c{i} missing/mispartitioned"
        # byte-intact passthrough: any window recycled too early would
        # corrupt exactly this
        assert bucket[f"c{i}"] == s, f"record c{i} bytes corrupted"
