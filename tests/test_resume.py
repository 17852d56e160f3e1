"""Restartable streaming: per-chunk manifest, interruption, and merge."""

import json
import os

import numpy as np
import pytest

from ribodetector_tpu import native
from ribodetector_tpu.cli import main as cli_main

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable"
)


def write_fastq(path, n, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as fh:
        for i in range(n):
            s = "".join(rng.choice(list("ACGT"), size=60))
            fh.write(f"@q{i}\n{s}\n+\n{'I' * 60}\n")


def run(tmp_path, inp, out, rr, extra=()):
    cli_main(
        ["-l", "60", "-i", str(inp), "-o", str(out), "-r", str(rr),
         "-m", "3", "--chunk_size", "1", *extra]
    )


def test_resume_complete_run_matches_plain(tmp_path):
    inp = tmp_path / "in.fq"
    write_fastq(inp, 900)
    run(tmp_path, inp, tmp_path / "a.fq", tmp_path / "ar.fq")
    run(tmp_path, inp, tmp_path / "b.fq", tmp_path / "br.fq", ["--resume"])
    assert (tmp_path / "a.fq").read_bytes() == (tmp_path / "b.fq").read_bytes()
    assert (tmp_path / "ar.fq").read_bytes() == (tmp_path / "br.fq").read_bytes()
    # manifest and parts cleaned up after success
    assert not os.path.exists(str(tmp_path / "b.fq") + ".progress.json")
    assert not os.path.exists(str(tmp_path / "b.fq") + ".parts")


def test_resume_after_interruption(tmp_path, monkeypatch):
    inp = tmp_path / "in.fq"
    write_fastq(inp, 1200)  # > 1 chunk at batch 256 * chunk_size 1
    run(tmp_path, inp, tmp_path / "ref.fq", tmp_path / "refr.fq")

    # crash after the first completed chunk
    from ribodetector_tpu.runtime.native_pipeline import ResumeState

    orig = ResumeState.complete_chunk
    calls = {"n": 0}

    def crashing(self, p, ci, fhs, num_read, counts):
        orig(self, p, ci, fhs, num_read, counts)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated crash")

    monkeypatch.setattr(ResumeState, "complete_chunk", crashing)
    with pytest.raises(KeyboardInterrupt):
        run(tmp_path, inp, tmp_path / "c.fq", tmp_path / "cr.fq", ["--resume"])
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)

    manifest = str(tmp_path / "c.fq") + ".progress.json"
    state = json.load(open(manifest))
    assert state["chunks_done"] == 1

    # resume and finish
    run(tmp_path, inp, tmp_path / "c.fq", tmp_path / "cr.fq", ["--resume"])
    assert (tmp_path / "c.fq").read_bytes() == (tmp_path / "ref.fq").read_bytes()
    assert (tmp_path / "cr.fq").read_bytes() == (tmp_path / "refr.fq").read_bytes()
    assert not os.path.exists(manifest)


def test_resume_rejects_mismatched_config(tmp_path):
    inp = tmp_path / "in.fq"
    write_fastq(inp, 300)
    manifest = str(tmp_path / "d.fq") + ".progress.json"
    json.dump(
        {"config": {"inputs": ["other.fq"], "len": 60, "ensure": "none",
                    "records_per_chunk": 99},
         "chunks_done": 1, "records_done": 99, "counts": {}},
        open(manifest, "w"),
    )
    with pytest.raises(RuntimeError, match="different run configuration"):
        run(tmp_path, inp, tmp_path / "d.fq", tmp_path / "dr.fq", ["--resume"])
