"""The 2-bit transfer lane: routing, packing parity, output identity.

Clean ACGTU full-length records ride a 25%-smaller 2-bit H2D format
(fastx.cpp rd_parse_fastq_b5b2 -> runtime lane len(buckets); see
ops/dispatch.unpack_b2_tokens). Labels must be bit-identical to the
base-5 path, so every mode's outputs are unchanged byte-for-byte.
"""

import gzip

import numpy as np
import pytest

from ribodetector_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser unavailable"
)


def test_pack_b2_roundtrip_device(rng):
    import jax.numpy as jnp

    from ribodetector_tpu.ops.dispatch import unpack_b2_tokens

    for T in (1, 3, 4, 7, 100, 127):
        toks = rng.integers(0, 4, (17, T)).astype(np.uint8)
        packed = native.pack_b2(toks)
        assert packed.shape == (17, native.b2_packed_len(T))
        out = np.asarray(unpack_b2_tokens(jnp.asarray(packed), T))
        np.testing.assert_array_equal(out, toks)


def test_parser_b2_rows_match_numpy_packer(rng):
    """Native b2 rows and eligibility agree with the numpy packer on a
    buffer mixing clean, N-containing, short, and lowercase reads."""
    recs, want_ok, want_rows = [], [], []
    lut = {c: t for c, t in zip("ACGTU", [0, 1, 2, 3, 3])}
    for i in range(200):
        kind = i % 4
        if kind == 0:
            seq = "".join(rng.choice(list("ACGT"), size=24))
        elif kind == 1:
            seq = "".join(rng.choice(list("ACGTN"), size=24))
        elif kind == 2:
            seq = "".join(rng.choice(list("ACGT"), size=int(rng.integers(1, 24))))
        else:
            seq = "".join(rng.choice(list("acgt"), size=24))
        recs.append(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
        ok = len(seq) == 24 and all(c in lut for c in seq)
        want_ok.append(ok)
        want_rows.append(
            native.pack_b2(
                np.array([[lut[c] for c in seq]], np.uint8)
            )[0]
            if ok
            else None
        )
    blob = "".join(recs).encode()
    _, _, p2, _, _, b2ok, _ = native.parse_fastq_chunk_b5b2(blob, 24)
    assert [bool(x) for x in b2ok] == want_ok
    for i, row in enumerate(want_rows):
        if row is not None:
            np.testing.assert_array_equal(p2[i], row)


def _write_fastq(path, seqs):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@r{i:06d}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.mark.parametrize("mixed", [False, True])
def test_b2_lane_outputs_identical_and_active(tmp_path, rng, mixed, monkeypatch):
    """CLI runs with the b2 lane on vs off produce byte-identical outputs;
    with clean full-length reads present the b2 unpack path is actually
    traced (proving records routed through the lane)."""
    import json

    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.config import DEFAULT_CONFIG
    from ribodetector_tpu.ops import dispatch

    L = 48
    seqs = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(600)]
    if mixed:
        # every third read ineligible: N content or short length
        for i in range(0, len(seqs), 3):
            seqs[i] = (
                seqs[i][: L - 5] + "NNNNN" if i % 2 else seqs[i][: L - 7]
            )
    inp = tmp_path / "in.fq"
    _write_fastq(inp, seqs)

    traced = []
    real = dispatch.unpack_b2_tokens
    monkeypatch.setattr(
        dispatch, "unpack_b2_tokens",
        lambda p, ml: (traced.append(1), real(p, ml))[1],
    )

    outs = {}
    for b2 in (True, False):
        cfg = json.loads(open(DEFAULT_CONFIG).read())
        cfg.setdefault("runtime", {})["b2"] = b2
        cfgp = tmp_path / f"cfg_{b2}.json"
        cfgp.write_text(json.dumps(cfg))
        o = tmp_path / f"o_{b2}.fq"
        r = tmp_path / f"r_{b2}.fq"
        cli_main([
            "-c", str(cfgp), "-l", str(L), "-i", str(inp), "-o", str(o),
            "-r", str(r), "--chunk_size", "1", "-m", "4", "-t", "1",
        ])
        outs[b2] = (o.read_bytes(), r.read_bytes())
    assert outs[True] == outs[False]
    assert traced, "b2 lane never traced -- eligible records did not route"


def test_b2_lane_paired_both_ends_gate(tmp_path, rng):
    """Paired: a pair rides the b2 lane only when BOTH ends are eligible;
    outputs match the lane-off run byte-for-byte (gz outputs compared
    decompressed), including -e both's unclassified file."""
    import json

    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.config import DEFAULT_CONFIG

    L = 40
    s1 = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(400)]
    s2 = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(400)]
    for i in range(0, 400, 5):
        s2[i] = s2[i][: L - 3] + "NNN"  # R2 ineligible -> pair stays base-5
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    _write_fastq(in1, s1)
    _write_fastq(in2, s2)

    outs = {}
    for b2 in (True, False):
        cfg = json.loads(open(DEFAULT_CONFIG).read())
        cfg.setdefault("runtime", {})["b2"] = b2
        cfgp = tmp_path / f"cfg_{b2}.json"
        cfgp.write_text(json.dumps(cfg))
        d = tmp_path / f"run_{b2}"
        d.mkdir()
        o1, o2 = d / "o1.fq.gz", d / "o2.fq.gz"
        r1, r2 = d / "r1o.fq.gz", d / "r2o.fq.gz"
        cli_main([
            "-c", str(cfgp), "-l", str(L), "-i", str(in1), str(in2),
            "-o", str(o1), str(o2), "-r", str(r1), str(r2),
            "-e", "both", "--chunk_size", "1", "-m", "4", "-t", "1",
        ])
        blobs = []
        for f in (o1, o2, r1, r2, d / "o1.fq.gz.unclassified.gz",
                  d / "o2.fq.gz.unclassified.gz"):
            blobs.append(gzip.decompress(f.read_bytes()))
        outs[b2] = blobs
    assert outs[True] == outs[False]


def test_b2_lane_with_length_buckets_identical(tmp_path, rng):
    """Variable-length input under --buckets auto: full-length clean reads
    ride the b2 lane while shorter/dirty reads route to length buckets --
    outputs must match the lane-off run byte-for-byte (scan kernel, so
    bucketing itself is exact)."""
    import json

    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.config import DEFAULT_CONFIG

    L = 128  # buckets auto -> [64, 128]
    seqs = []
    for i in range(500):
        if i % 3 == 0:
            seqs.append("".join(rng.choice(list("ACGT"), size=L)))  # b2
        elif i % 3 == 1:
            seqs.append("".join(rng.choice(list("ACGT"), size=int(rng.integers(20, 64)))))
        else:
            s = "".join(rng.choice(list("ACGT"), size=L))
            seqs.append(s[: L - 2] + "NN")  # full length but dirty -> b5
    inp = tmp_path / "in.fq"
    _write_fastq(inp, seqs)

    outs = {}
    for b2 in (True, False):
        cfg = json.loads(open(DEFAULT_CONFIG).read())
        cfg.setdefault("runtime", {})["b2"] = b2
        cfg["runtime"]["kernel"] = "scan"
        cfgp = tmp_path / f"cfg_{b2}.json"
        cfgp.write_text(json.dumps(cfg))
        o, r = tmp_path / f"o_{b2}.fq", tmp_path / f"r_{b2}.fq"
        cli_main([
            "-c", str(cfgp), "-l", str(L), "-i", str(inp), "-o", str(o),
            "-r", str(r), "--buckets", "auto", "--chunk_size", "1",
            "-m", "4", "-t", "1",
        ])
        outs[b2] = (o.read_bytes(), r.read_bytes())
    assert outs[True] == outs[False]
    total = sum(len(v.splitlines()) for v in outs[True]) // 4
    assert total == 500
