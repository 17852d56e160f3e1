"""Multi-device sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ribodetector_tpu.encode import encode_batch
from ribodetector_tpu.models import load_params, bilstm_logits
from ribodetector_tpu.parallel import make_data_mesh, make_dp_tp_mesh
from ribodetector_tpu.parallel.sharded import (
    host_chunk_assignment,
    make_sharded_classifier,
    merge_counts,
)
from tests.conftest import random_reads


@pytest.fixture(scope="module")
def params(ref_params_path):
    return load_params(ref_params_path)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_classifier_matches_single_device(params, rng):
    mesh = make_data_mesh(8)
    seqs = random_reads(rng, 64, lmin=20, lmax=50)
    tokens, lengths = encode_batch(seqs, 50)
    infer = make_sharded_classifier(params, mesh)
    got = np.asarray(infer(jnp.asarray(tokens), jnp.asarray(lengths)))
    want = np.asarray(bilstm_logits(params, jnp.asarray(tokens), semantics="dense"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dp_tp_mesh_shapes():
    mesh = make_dp_tp_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")
    # non-divisible tp falls back to 1
    mesh = make_dp_tp_mesh(5, tp=2)
    assert mesh.devices.shape == (5, 1)


def test_predictor_autoshards_over_all_devices(ref_params_path, rng):
    """The CLI engine picks up every visible device automatically (the
    reference's counterpart, torch DataParallel, is latent/broken --
    SURVEY.md C8). Sharded logits must match the single-device forward."""
    from types import SimpleNamespace

    from ribodetector_tpu.config import ConfigParser
    from ribodetector_tpu.runtime.pipeline import Predictor

    cfg = ConfigParser(
        {"state_file": {"mcc": ref_params_path, "recall": ref_params_path}}
    )
    args = SimpleNamespace(
        ensure="none", len=50, log=None, semantics=None, precision=None
    )
    p = Predictor(cfg, args)
    p.load_model()
    assert p.mesh is not None and p.mesh.devices.size == 8
    assert p.input_sharding is not None
    seqs = random_reads(rng, 64, lmin=20, lmax=50)
    tokens, lengths = encode_batch(seqs, 50)
    got = np.asarray(p._infer(tokens, lengths))
    want = np.asarray(
        bilstm_logits(
            load_params(ref_params_path), jnp.asarray(tokens), semantics="dense"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_host_chunk_assignment_partitions():
    owners = [
        [c for c in range(12) if host_chunk_assignment(c, 3, h)] for h in range(3)
    ]
    assert sorted(sum(owners, [])) == list(range(12))
    assert owners[0] == [0, 3, 6, 9]


def test_merge_counts_single_host():
    assert merge_counts({"rrna": 3, "norrna": 5}) == {"rrna": 3, "norrna": 5}


def test_merge_counts_limbs_exact_past_int32():
    """Counters survive >2**31 total reads without x64: the collective ships
    int31 limbs and the recombination happens in numpy int64 (round-3 verdict:
    jnp.int64 silently truncated to int32 under default JAX config)."""
    from ribodetector_tpu.parallel.sharded import counts_to_limbs, limbs_to_counts

    per_host = [
        {"num_read": 2**31 + 12345, "rrna": 2**33 + 7, "norrna": 0},
        {"num_read": 2**31 - 1, "rrna": 99, "norrna": 2**31},
        {"num_read": 3, "rrna": 2**40, "norrna": 1},
    ]
    keys = sorted(per_host[0])
    limbs = np.stack([counts_to_limbs(c, keys) for c in per_host])
    assert limbs.dtype == np.int32  # what actually rides the collective
    got = limbs_to_counts(limbs, keys)
    want = {k: sum(c[k] for c in per_host) for k in keys}
    assert got == want
    assert got["rrna"] == 2**33 + 7 + 99 + 2**40  # > 2**31, exact


def test_merge_counts_limbs_roundtrip_single_host_shape():
    from ribodetector_tpu.parallel.sharded import counts_to_limbs, limbs_to_counts

    c = {"a": 0, "b": 2**31, "c": 2**45 + 17}
    keys = sorted(c)
    assert limbs_to_counts(counts_to_limbs(c, keys)[None], keys) == c


def test_multihost_cli_shards_partition_the_input(tmp_path, rng, ref_params_path):
    """--hosts N / --host-id k: per-host shards are disjoint and their union
    equals the single-host partition (native path, CPU backend)."""
    import gzip

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")

    n_reads = 5000
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(n_reads)]
    inp = tmp_path / "in.fq"
    with open(inp, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@h{i}\n{s}\n+\n{'I' * len(s)}\n")

    def ids(path, opener=open):
        with opener(path, "rt") as fh:
            return {l.split()[0][1:] for i, l in enumerate(fh) if i % 4 == 0}

    # single-host truth
    out0 = tmp_path / "single.fq"
    rr0 = tmp_path / "single.rr.fq.gz"
    cli_main(["-l", "60", "-i", str(inp), "-o", str(out0), "-r", str(rr0),
              "-m", "3", "--chunk_size", "1"])
    want_non, want_rr = ids(out0), ids(rr0, gzip.open)

    # two cooperating hosts over the same input
    outs, rrs = [], []
    for k in range(2):
        out = tmp_path / "multi.fq"
        rr = tmp_path / "multi.rr.fq.gz"
        cli_main(["-l", "60", "-i", str(inp), "-o", str(out), "-r", str(rr),
                  "-m", "3", "--chunk_size", "1",
                  "--hosts", "2", "--host-id", str(k)])
        outs.append(ids(tmp_path / f"multi.fq.host{k:03d}"))
        rrs.append(ids(tmp_path / f"multi.rr.fq.host{k:03d}.gz", gzip.open))

    assert outs[0] | outs[1] == want_non
    assert not outs[0] & outs[1]
    assert rrs[0] | rrs[1] == want_rr
    # both hosts actually did work (5000 reads / 2048-read chunks = 3 chunks)
    assert outs[0] and outs[1]
    # gz shards concatenate into one valid gzip file
    merged = tmp_path / "merged.rr.fq.gz"
    with open(merged, "wb") as dst:
        for k in range(2):
            dst.write((tmp_path / f"multi.rr.fq.host{k:03d}.gz").read_bytes())
    assert ids(merged, gzip.open) == want_rr
