"""End-to-end CLI golden tests: output partition vs the torch reference model.

Mirrors the parity bar from BASELINE.json ("outputs must exactly match the
reference on its test reads"): reference labels are computed independently
with torch from the official checkpoint using the dense/ONNX semantics
(the detect_cpu path, reference: detect_cpu.py:686-734).
"""

import gzip

import numpy as np
import pytest

from ribodetector_tpu.cli import main as cli_main
from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
from tests.conftest import random_reads

LEN = 50


def write_fastq(path, names, seqs):
    op = gzip.open if str(path).endswith("gz") else open
    with op(path, "wt") as fh:
        for n, s in zip(names, seqs):
            fh.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")


def read_headers(path):
    op = gzip.open if str(path).endswith("gz") else open
    with op(path, "rt") as fh:
        lines = fh.read().splitlines()
    return [l for i, l in enumerate(lines) if i % 4 == 0]


@pytest.fixture(scope="module")
def golden(rng, torch_reference):
    dense_logits, _ = torch_reference
    seqs = random_reads(rng, 40, lmin=20, lmax=60)
    seqs += ["N" * 30, "acgt" * 10, "A" * 60]
    names = [f"r{i}" for i in range(len(seqs))]
    tokens, _ = encode_batch(seqs, LEN)
    logits = dense_logits(tokens_to_onehot_np(tokens))
    return names, seqs, logits


def run_cli(tmp_path, argv):
    cli_main(argv)


def test_single_end_partition_matches_reference(tmp_path, golden):
    names, seqs, logits = golden
    labels = logits.argmax(1)
    inp = tmp_path / "in.fq.gz"
    write_fastq(inp, names, seqs)
    out = tmp_path / "out.norrna.fq"
    rrna = tmp_path / "out.rrna.fq.gz"
    run_cli(
        tmp_path,
        ["-l", str(LEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--kernel", "scan"],
    )
    got_norrna = read_headers(out)
    got_rrna = read_headers(rrna)
    want_norrna = [f"@{n}" for n, l in zip(names, labels) if l == 0]
    want_rrna = [f"@{n}" for n, l in zip(names, labels) if l == 1]
    # exact read-for-read partition AND deterministic input ordering
    assert got_norrna == want_norrna
    assert got_rrna == want_rrna


@pytest.mark.parametrize("ensure", ["none", "rrna", "norrna", "both"])
def test_paired_end_all_ensure_modes(tmp_path, golden, torch_reference, ensure, rng):
    dense_logits, _ = torch_reference
    n = 30
    seqs1 = random_reads(rng, n, lmin=30, lmax=LEN)
    seqs2 = random_reads(rng, n, lmin=30, lmax=LEN)
    names = [f"p{i}" for i in range(n)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)

    t1, _ = encode_batch(seqs1, LEN)
    t2, _ = encode_batch(seqs2, LEN)
    l1 = dense_logits(tokens_to_onehot_np(t1))
    l2 = dense_logits(tokens_to_onehot_np(t2))
    a1, a2 = l1.argmax(1), l2.argmax(1)
    # reference truth tables restated independently (detect.py:616-663)
    if ensure == "rrna":
        want = np.where((a1 == 1) & (a2 == 1), 1, 0)
    elif ensure == "norrna":
        want = np.where((a1 == 0) & (a2 == 0), 0, 1)
    elif ensure == "both":
        want = np.where(a1 == a2, a1, -1)
    else:
        want = (l1 + l2).argmax(1)

    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    rr1, rr2 = tmp_path / "rr1.fq", tmp_path / "rr2.fq"
    run_cli(
        tmp_path,
        ["-l", str(LEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-e", ensure, "-m", "3", "--chunk_size", "2",
         "--kernel", "scan"],
    )

    for out, rr, unclf in ((out1, rr1, str(out1) + ".unclassified.gz"),
                           (out2, rr2, str(out2) + ".unclassified.gz")):
        assert read_headers(out) == [f"@{n}" for n, l in zip(names, want) if l == 0]
        assert read_headers(rr) == [f"@{n}" for n, l in zip(names, want) if l == 1]
        if ensure == "both":
            # quirk #5: discordant pairs in <output>.unclassified.gz
            assert read_headers(unclf) == [
                f"@{n}" for n, l in zip(names, want) if l == -1
            ]


def test_invalid_file_counts_raise(tmp_path):
    inp = tmp_path / "in.fq"
    write_fastq(inp, ["a"], ["ACGT"])
    with pytest.raises(RuntimeError, match="no more than two files"):
        run_cli(tmp_path, ["-l", "50", "-i", str(inp), "-o", "x.fq", "y.fq"])
    with pytest.raises(RuntimeError, match="rRNA"):
        run_cli(
            tmp_path,
            ["-l", "50", "-i", str(inp), "-o", str(tmp_path / "x.fq"),
             "-r", "a.fq", "b.fq"],
        )


def test_paired_files_truncate_to_shorter(tmp_path, golden):
    # quirk #8: paired chunk iterator zips R1/R2 (seq_encoder.py:90-92)
    names5 = [f"x{i}" for i in range(5)]
    names3 = [f"x{i}" for i in range(3)]
    in1, in2 = tmp_path / "a1.fq", tmp_path / "a2.fq"
    write_fastq(in1, names5, ["ACGT" * 10] * 5)
    write_fastq(in2, names3, ["TTTT" * 10] * 3)
    out1, out2 = tmp_path / "b1.fq", tmp_path / "b2.fq"
    run_cli(
        tmp_path,
        ["-l", "50", "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-m", "3", "--chunk_size", "1", "--kernel", "scan"],
    )
    assert len(read_headers(out1)) == len(read_headers(out2)) <= 3


def test_native_progress_bar_on_tty(tmp_path):
    """Visual parity with the reference's live tqdm bar (detect.py:176-182):
    on a tty the native runner shows a live reads bar; without one (pytest,
    pipes, logs) it stays silent and the throttled log lines take over."""
    import os
    import pty
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = [f"t{i}" for i in range(400)]
    seqs = ["ACGTTGCA" * 7 for _ in names]
    inp = tmp_path / "in.fq"
    write_fastq(inp, names, seqs)
    argv = [sys.executable, "-m", "ribodetector_tpu", "-l", "56",
            "-i", str(inp), "-o", str(tmp_path / "o.fq"),
            "-m", "3", "--kernel", "scan"]
    master, slave = pty.openpty()
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    proc = subprocess.Popen(argv, stdout=slave, stderr=slave, cwd=repo,
                            env=env)
    os.close(slave)
    out = b""
    try:
        while True:
            try:
                chunk = os.read(master, 65536)
            except OSError:
                break
            if not chunk:
                break
            out += chunk
    finally:
        os.close(master)
    assert proc.wait(timeout=280) == 0, out[-2000:]
    text = out.decode("utf-8", "replace")
    assert " reads" in text and "\r" in text  # a live bar was drawn
    assert "sequences finished" not in text  # bar replaces the log lines


def test_portable_path_matches_native_end_to_end(tmp_path, rng):
    """runtime.native=false (the no-g++ fallback engine, Predictor.run/
    run_with_chunks) must produce byte-identical plain outputs to the
    native fast path for single and paired runs."""
    import json

    from ribodetector_tpu import native
    from ribodetector_tpu.config import DEFAULT_CONFIG

    if not native.available():
        pytest.skip("native extension unavailable (nothing to compare against)")

    cfg = json.load(open(DEFAULT_CONFIG))
    cfg.setdefault("runtime", {})["native"] = False
    cfgp = tmp_path / "portable.json"
    json.dump(cfg, open(cfgp, "w"))

    n = 400
    seqs1 = random_reads(rng, n, lmin=20, lmax=80)
    seqs2 = random_reads(rng, n, lmin=20, lmax=80)
    names = [f"pp{i}" for i in range(n)]
    write_fastq(tmp_path / "r1.fq", names, seqs1)
    write_fastq(tmp_path / "r2.fq", names, seqs2)

    def run(tag, extra=()):
        cli_main(["-l", "80", "-i", str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq"),
                  "-o", str(tmp_path / f"{tag}1.fq"), str(tmp_path / f"{tag}2.fq"),
                  "-r", str(tmp_path / f"{tag}r1.fq"), str(tmp_path / f"{tag}r2.fq"),
                  "-e", "both", "-m", "3", "--kernel", "scan", *extra])

    run("nat", ["--chunk_size", "1"])
    run("port", ["--chunk_size", "1", "-c", str(cfgp)])
    for stem in ("1.fq", "2.fq", "r1.fq", "r2.fq"):
        assert (tmp_path / f"port{stem}").read_bytes() == (
            tmp_path / f"nat{stem}"
        ).read_bytes(), stem

    # single-end whole-file mode too
    cli_main(["-l", "80", "-i", str(tmp_path / "r1.fq"),
              "-o", str(tmp_path / "sn.fq"), "-m", "3", "--kernel", "scan"])
    cli_main(["-l", "80", "-i", str(tmp_path / "r1.fq"),
              "-o", str(tmp_path / "sp.fq"), "-m", "3", "--kernel", "scan",
              "-c", str(cfgp)])
    assert (tmp_path / "sp.fq").read_bytes() == (tmp_path / "sn.fq").read_bytes()
