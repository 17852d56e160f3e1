"""Length-bucketed batching: router, zero-prefix init exactness, e2e parity.

BASELINE config 4. The correctness core: under dense/ONNX semantics
(reference: ribodetector/model/model_cpu.py:29-37,57-62 over
seq_encoder.py:130-145 zero padding) the backward LSTM absorbs only
zero-input steps above a read's last non-zero row, and those depend only on
their count -- so bucket T_b + zero_prefix_state(params, max_len - T_b)
reproduces the full recurrence exactly. All-zero reads gather at T-1 (the
argmax-of-zeros quirk) and must run the full bucket.
"""

import numpy as np
import pytest

from ribodetector_tpu.cli import main as cli_main
from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np
from ribodetector_tpu.runtime.buckets import PAD_B5, choose_buckets, route_records


def test_choose_buckets():
    assert choose_buckets(300, "auto") == [64, 128, 192, 256, 300]
    assert choose_buckets(100, "auto") == [64, 100]
    assert choose_buckets(64, "auto") is None  # degenerate single bucket
    assert choose_buckets(50, "auto") is None
    assert choose_buckets(300, "off") is None
    assert choose_buckets(300, "96,200") == [96, 200, 300]
    with pytest.raises(ValueError):
        choose_buckets(300, "96,400")
    with pytest.raises(ValueError):
        choose_buckets(300, "abc")


def test_route_records_boundaries_and_allpad():
    from ribodetector_tpu import native

    buckets = [64, 128, 192, 256, 300]
    lengths = np.asarray([1, 64, 65, 128, 300, 40], np.int32)
    toks = np.full((6, native.b5_packed_len(300)), 0, np.uint8)
    toks[5, :] = PAD_B5  # an all-N read: every packed byte is the pad trio
    idx = route_records(lengths, toks, buckets, 300)
    assert idx.tolist() == [0, 0, 1, 1, 4, 4]  # last forced to full bucket


@pytest.fixture(scope="module")
def params(ref_params_path):
    from ribodetector_tpu.models.bilstm import load_params

    return load_params(ref_params_path)


def test_zero_prefix_state_exactness(params, rng):
    """Bucketed scan == full scan bit-for-bit, incl. trailing/internal Ns."""
    import jax

    from ribodetector_tpu.models.bilstm import bilstm_logits, zero_prefix_state

    L, B = 300, 48
    lens = rng.integers(5, 129, B)
    toks = np.full((B, L), 4, np.uint8)
    for i, ln in enumerate(lens):
        toks[i, :ln] = rng.integers(0, 5, ln)  # token 4 inside = N
    full = np.asarray(
        jax.jit(lambda t: bilstm_logits(params, t, semantics="dense"))(toks)
    )
    for tb in (128, 192):
        init = zero_prefix_state(params, L - tb)
        got = np.asarray(
            jax.jit(
                lambda t: bilstm_logits(params, t, semantics="dense", bwd_init=init)
            )(toks[:, :tb])
        )
        np.testing.assert_array_equal(got, full)


def test_pallas_bucket_parity(params, rng):
    """Pallas x6 kernel with bwd_init matches the full-length scan."""
    from ribodetector_tpu.models.bilstm import bilstm_logits, zero_prefix_state
    from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas
    import jax

    L, B, tb = 300, 16, 128
    lens = rng.integers(5, 121, B)
    toks = np.full((B, L), 4, np.uint8)
    for i, ln in enumerate(lens):
        toks[i, :ln] = rng.integers(0, 5, ln)
    full = np.asarray(
        jax.jit(lambda t: bilstm_logits(params, t, semantics="dense"))(toks)
    )
    init = zero_prefix_state(params, L - tb)
    got = np.asarray(
        bilstm_logits_pallas(
            params, toks[:, :tb], semantics="dense", matmul="x6",
            interpret=True, bwd_init=init,
        )
    )
    assert np.abs(got - full).max() < 1e-4
    assert (got.argmax(1) == full.argmax(1)).all()


LEN = 130  # buckets [64, 128, 130]


def _mixed_reads(rng, n):
    reads = []
    for i in range(n):
        ln = int(rng.integers(15, LEN + 20))  # some exceed -l (truncation)
        reads.append("".join(rng.choice(list("ACGTNacgt"), ln)))
    reads += ["N" * 80, "n" * 40, "A" * LEN]  # all-zero reads -> full bucket
    return reads


@pytest.fixture(scope="module")
def mixed(rng, torch_reference):
    dense_logits, _ = torch_reference
    seqs = _mixed_reads(rng, 400)
    names = [f"b{i}" for i in range(len(seqs))]
    # FASTA is uppercased by the parser (quirk #1, fastx_parser.py:53), so
    # the golden encodes the uppercased reads
    tokens, _ = encode_batch([s.upper() for s in seqs], LEN)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)
    return names, seqs, labels


def _fa_headers(path):
    with open(path) as fh:
        return [l.strip() for l in fh if l.startswith(">")]


@pytest.mark.parametrize("buckets", ["auto", "off"])
def test_bucketed_fasta_single_end(tmp_path, mixed, buckets):
    """Bucketed and unbucketed runs produce the identical partition, equal
    to the torch full-length reference (FASTA input, BASELINE config 4)."""
    names, seqs, labels = mixed
    inp = tmp_path / "in.fa"
    with open(inp, "w") as fh:
        for n, s in zip(names, seqs):
            fh.write(f">{n}\n{s}\n")
    out, rrna = tmp_path / f"o_{buckets}.fa", tmp_path / f"r_{buckets}.fa"
    cli_main(
        ["-l", str(LEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--chunk_size", "2", "--kernel", "scan",
         "--buckets", buckets],
    )
    assert _fa_headers(out) == [f">{n}" for n, l in zip(names, labels) if l == 0]
    assert _fa_headers(rrna) == [f">{n}" for n, l in zip(names, labels) if l == 1]


def test_bucketed_paired_ensure_both(tmp_path, rng, torch_reference):
    from tests.test_cli_end2end import read_headers, write_fastq

    dense_logits, _ = torch_reference
    n = 300
    seqs1 = _mixed_reads(rng, n)[:n]
    seqs2 = _mixed_reads(rng, n)[:n]
    names = [f"pb{i}" for i in range(n)]
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(in1, names, seqs1)
    write_fastq(in2, names, seqs2)
    t1, _ = encode_batch(seqs1, LEN)
    t2, _ = encode_batch(seqs2, LEN)
    a1 = dense_logits(tokens_to_onehot_np(t1)).argmax(1)
    a2 = dense_logits(tokens_to_onehot_np(t2)).argmax(1)
    want = np.where(a1 == a2, a1, -1)

    out1, out2 = tmp_path / "o1.fq", tmp_path / "o2.fq"
    rr1, rr2 = tmp_path / "rr1.fq", tmp_path / "rr2.fq"
    cli_main(
        ["-l", str(LEN), "-i", str(in1), str(in2), "-o", str(out1), str(out2),
         "-r", str(rr1), str(rr2), "-e", "both", "-m", "3",
         "--chunk_size", "2", "--kernel", "scan", "--buckets", "auto"],
    )
    for out, rr, unclf in ((out1, rr1, str(out1) + ".unclassified.gz"),
                           (out2, rr2, str(out2) + ".unclassified.gz")):
        assert read_headers(out) == [f"@{n}" for n, l in zip(names, want) if l == 0]
        assert read_headers(rr) == [f"@{n}" for n, l in zip(names, want) if l == 1]
        assert read_headers(unclf) == [f"@{n}" for n, l in zip(names, want) if l == -1]


def test_bucketed_dirty_crlf_records(tmp_path, rng, torch_reference):
    """CRLF FASTQ records take the text-fallback write path (the native
    parser flags them dirty); bucketed mode must route/scatter them the
    same and re-emit reference-exact rstripped text."""
    dense_logits, _ = torch_reference
    n = 300
    seqs = [
        "".join(rng.choice(list("ACGT"), int(rng.integers(15, LEN + 1))))
        for _ in range(n)
    ]
    names = [f"w{i}" for i in range(n)]
    inp = tmp_path / "crlf.fq"
    with open(inp, "wb") as fh:
        for nm, s in zip(names, seqs):
            fh.write(f"@{nm}\r\n{s}\r\n+\r\n{'I' * len(s)}\r\n".encode())

    tokens, _ = encode_batch(seqs, LEN)
    labels = dense_logits(tokens_to_onehot_np(tokens)).argmax(1)

    out, rrna = tmp_path / "o.fq", tmp_path / "r.fq"
    cli_main(
        ["-l", str(LEN), "-i", str(inp), "-o", str(out), "-r", str(rrna),
         "-m", "3", "--chunk_size", "1", "--kernel", "scan",
         "--buckets", "auto"],
    )
    from tests.test_cli_end2end import read_headers

    assert read_headers(out) == [f"@{n}" for n, l in zip(names, labels) if l == 0]
    assert read_headers(rrna) == [f"@{n}" for n, l in zip(names, labels) if l == 1]
    # reference text semantics: lines rstripped (no \r in output)
    assert b"\r" not in out.read_bytes() + rrna.read_bytes()


@pytest.mark.parametrize("seed", [101, 202])
def test_bucketed_vs_unbucketed_differential_fuzz(tmp_path, seed):
    """Randomized differential invariant: for arbitrary read soups (mixed
    lengths 1..350, lowercase, N-runs, all-N reads, empty-adjacent
    lengths), `--buckets auto` must be byte-identical to `--buckets off`
    under the exact fp32 scan kernel at -l 300 (5 buckets engaged)."""
    from ribodetector_tpu.cli import main as cli_main

    rng = np.random.default_rng(seed)
    inp = tmp_path / "in.fq"
    alphabet = list("ACGTacgtN")
    with open(inp, "w") as fh:
        for i in range(700):
            n = int(rng.integers(1, 350))
            if i % 37 == 0:
                s = "N" * n  # all-pad read: T-1 gather quirk, full bucket
            else:
                s = "".join(rng.choice(alphabet, size=n))
            fh.write(f"@f{i}\n{s}\n+\n{'I' * n}\n")

    outs = {}
    for mode in ("auto", "off"):
        cli_main(["-l", "300", "-i", str(inp),
                  "-o", str(tmp_path / f"o_{mode}.fq"),
                  "-r", str(tmp_path / f"r_{mode}.fq"),
                  "-m", "3", "--chunk_size", "1", "--kernel", "scan",
                  "--buckets", mode])
        outs[mode] = (
            (tmp_path / f"o_{mode}.fq").read_bytes(),
            (tmp_path / f"r_{mode}.fq").read_bytes(),
        )
    assert outs["auto"] == outs["off"]
    # sanity: both classes non-trivially populated
    assert outs["auto"][0] and outs["auto"][1]
