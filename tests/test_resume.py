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


def test_paired_resume_interruption_mixed_record_sizes(tmp_path, monkeypatch):
    """Paired --resume restarts with a record-exact skip on BOTH sides:
    the round-2 code skipped whole stream chunks per side, which desynced
    pairs whenever the two files' byte-window chunking differed (mixed
    record sizes force exactly that)."""
    n = 1200
    base = "ACGTTGCA" * 30
    in1, in2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for i in range(n):
            s1 = base[: (30 if i < n // 2 else 180)]
            s2 = base[5:45]
            f1.write(f"@p{i}\n{s1}\n+\n{'I' * len(s1)}\n")
            f2.write(f"@p{i}\n{s2}\n+\n{'I' * len(s2)}\n")

    def prun(o1, o2, r1, r2, extra=()):
        cli_main(
            ["-l", "60", "-i", str(in1), str(in2), "-o", str(o1), str(o2),
             "-r", str(r1), str(r2), "-e", "both", "-m", "4",
             "--chunk_size", "1", *extra]
        )

    prun(tmp_path / "a1.fq", tmp_path / "a2.fq",
         tmp_path / "ar1.fq", tmp_path / "ar2.fq")

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
        prun(tmp_path / "b1.fq", tmp_path / "b2.fq",
             tmp_path / "br1.fq", tmp_path / "br2.fq", ["--resume"])
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    prun(tmp_path / "b1.fq", tmp_path / "b2.fq",
         tmp_path / "br1.fq", tmp_path / "br2.fq", ["--resume"])

    for a, b in (("a1.fq", "b1.fq"), ("a2.fq", "b2.fq"),
                 ("ar1.fq", "br1.fq"), ("ar2.fq", "br2.fq")):
        assert (tmp_path / a).read_bytes() == (tmp_path / b).read_bytes(), a


def test_resume_bucketed_matches_buckets_off(tmp_path):
    """--resume runs the bucketed engine (round 4: resume is no longer a
    depth-1 performance cliff on a separate code path). At -l 100 the
    default buckets are [64, 100]; under exact fp32 (scan kernel) bucketing
    is byte-exact, so a bucketed resume run must reproduce a buckets-off
    fresh run exactly."""
    inp = tmp_path / "in.fq"
    write_fastq(inp, 900, seed=3)
    base = ["-l", "100", "-i", str(inp), "-m", "3", "--chunk_size", "1",
            "--kernel", "scan"]
    cli_main(base + ["-o", str(tmp_path / "a.fq"), "-r", str(tmp_path / "ar.fq"),
                     "--buckets", "off"])
    cli_main(base + ["-o", str(tmp_path / "b.fq"), "-r", str(tmp_path / "br.fq"),
                     "--resume"])
    assert (tmp_path / "a.fq").read_bytes() == (tmp_path / "b.fq").read_bytes()
    assert (tmp_path / "ar.fq").read_bytes() == (tmp_path / "br.fq").read_bytes()


def test_resume_completion_is_writer_ordered_not_a_barrier(tmp_path):
    """The manifest update for chunk N runs on the writer thread (ordered
    after chunk N's writes), not via a per-chunk barrier on the dispatch
    thread -- the structural property that lets a resumed run keep DEPTH
    batches in flight across chunk boundaries (round-3 verdict: resume
    finished every batch synchronously, a several-fold slowdown)."""
    import threading

    from ribodetector_tpu.runtime.native_pipeline import ResumeState

    inp = tmp_path / "in.fq"
    write_fastq(inp, 5000, seed=5)  # 3 chunks at the 2048-record chunk size
    calls = []
    orig = ResumeState.complete_chunk

    def recording(self, p, ci, fhs, num_read, counts):
        calls.append((ci, threading.current_thread().name, num_read))
        return orig(self, p, ci, fhs, num_read, counts)

    ResumeState.complete_chunk = recording
    try:
        run(tmp_path, inp, tmp_path / "w.fq", tmp_path / "wr.fq", ["--resume"])
    finally:
        ResumeState.complete_chunk = orig
    assert len(calls) >= 2  # multiple chunks
    main = threading.main_thread().name
    assert all(t != main for _, t, _ in calls)
    # manifest completion order and record counts stay cumulative
    assert [c[0] for c in calls] == sorted(c[0] for c in calls)
    assert calls[-1][2] == 5000


def test_fasta_resume_after_interruption(tmp_path, monkeypatch):
    """--resume works on native FASTA inputs too: the offset manifest is
    format-agnostic (FASTA records are re-emitted normalized text, but the
    byte-gather writes and per-chunk offsets behave identically)."""
    rng = np.random.default_rng(21)
    inp = tmp_path / "in.fa"
    with open(inp, "w") as fh:
        for i in range(5000):
            s = "".join(rng.choice(list("acgtACGT"), size=70))
            fh.write(f">f{i} desc\n{s[:35]}\n{s[35:]}\n")  # multi-line

    def fa_run(tag, extra=()):
        cli_main(["-l", "70", "-i", str(inp), "-o", str(tmp_path / f"{tag}.fa"),
                  "-r", str(tmp_path / f"{tag}r.fa"), "-m", "3",
                  "--chunk_size", "1", *extra])

    fa_run("ref")

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
        fa_run("res", ["--resume"])
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    fa_run("res", ["--resume"])
    assert (tmp_path / "res.fa").read_bytes() == (tmp_path / "ref.fa").read_bytes()
    assert (tmp_path / "resr.fa").read_bytes() == (tmp_path / "refr.fa").read_bytes()
    assert not os.path.exists(str(tmp_path / "res.fa") + ".progress.json")


def test_resume_survives_repeated_crashes(tmp_path, monkeypatch):
    """Crash -> resume -> crash again -> resume: the offset manifest of a
    RESUMED run must itself be resumable (offsets keep absolute file
    positions, so a second truncate-and-continue cycle composes)."""
    inp = tmp_path / "in.fq"
    write_fastq(inp, 9000, seed=7)  # 5 chunks at 2048 records
    run(tmp_path, inp, tmp_path / "ref.fq", tmp_path / "refr.fq")

    from ribodetector_tpu.runtime.native_pipeline import ResumeState

    orig = ResumeState.complete_chunk

    def make_crasher(crash_at_ci):
        def crashing(self, p, ci, fhs, num_read, counts):
            orig(self, p, ci, fhs, num_read, counts)
            if ci == crash_at_ci:
                raise KeyboardInterrupt("simulated crash")
        return crashing

    for crash_ci in (0, 2):
        monkeypatch.setattr(ResumeState, "complete_chunk", make_crasher(crash_ci))
        with pytest.raises(KeyboardInterrupt):
            run(tmp_path, inp, tmp_path / "c.fq", tmp_path / "cr.fq", ["--resume"])
        manifest = json.load(open(str(tmp_path / "c.fq") + ".progress.json"))
        assert manifest["chunks_done"] == crash_ci + 1
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    run(tmp_path, inp, tmp_path / "c.fq", tmp_path / "cr.fq", ["--resume"])
    assert (tmp_path / "c.fq").read_bytes() == (tmp_path / "ref.fq").read_bytes()
    assert (tmp_path / "cr.fq").read_bytes() == (tmp_path / "refr.fq").read_bytes()
    assert not os.path.exists(str(tmp_path / "c.fq") + ".progress.json")


def test_resume_rejects_changed_label_settings(tmp_path, monkeypatch):
    """Resuming with a different --semantics (or any label-affecting
    setting) must be refused -- mixing numeric regimes in one output file
    would be silent corruption (round-4 review finding)."""
    inp = tmp_path / "in.fq"
    write_fastq(inp, 5000, seed=13)

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
        run(tmp_path, inp, tmp_path / "e.fq", tmp_path / "er.fq",
            ["--resume", "--semantics", "dense"])
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    with pytest.raises(RuntimeError, match="different run configuration"):
        run(tmp_path, inp, tmp_path / "e.fq", tmp_path / "er.fq",
            ["--resume", "--semantics", "packed"])
    # and with the rrna output dropped (a file-set change)
    with pytest.raises(RuntimeError, match="different run configuration"):
        cli_main(["-l", "60", "-i", str(inp), "-o", str(tmp_path / "e.fq"),
                  "-m", "3", "--chunk_size", "1", "--resume",
                  "--semantics", "dense"])
    # unchanged settings still resume fine
    run(tmp_path, inp, tmp_path / "e.fq", tmp_path / "er.fq",
        ["--resume", "--semantics", "dense"])


def test_resume_refuses_tampered_output(tmp_path, monkeypatch):
    """A resumed run whose output file is shorter than the manifest's
    recorded offset must refuse (os.truncate would otherwise zero-EXTEND
    the file -- silent corruption; round-4 review finding)."""
    inp = tmp_path / "in.fq"
    write_fastq(inp, 5000, seed=17)

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
        run(tmp_path, inp, tmp_path / "t.fq", tmp_path / "tr.fq", ["--resume"])
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    (tmp_path / "t.fq").write_bytes(b"tiny")  # shorter than the offset
    with pytest.raises(RuntimeError, match="shorter than the manifest"):
        run(tmp_path, inp, tmp_path / "t.fq", tmp_path / "tr.fq", ["--resume"])


def test_resume_refuses_changed_weights(tmp_path, monkeypatch):
    """The manifest records a digest of the weights: resuming with a
    different checkpoint at the same path is refused (mixed-model output
    would be silent corruption)."""
    import shutil
    from types import SimpleNamespace

    import jax

    from ribodetector_tpu.models.bilstm import init_params, save_params
    from ribodetector_tpu.runtime.native_pipeline import ResumeState

    inp = tmp_path / "in.fq"
    write_fastq(inp, 5000, seed=19)
    ck = tmp_path / "w.npz"
    shutil.copy("ribodetector_tpu/data/ribodetector_v1.npz", ck)
    cfgp = tmp_path / "cfg.json"
    import json as _json

    from ribodetector_tpu.config import DEFAULT_CONFIG

    cfg = _json.load(open(DEFAULT_CONFIG))
    cfg["state_file"] = {"mcc": str(ck), "recall": str(ck)}
    _json.dump(cfg, open(cfgp, "w"))

    orig = ResumeState.complete_chunk
    calls = {"n": 0}

    def crashing(self, p, ci, fhs, num_read, counts):
        orig(self, p, ci, fhs, num_read, counts)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated crash")

    argv = ["-c", str(cfgp), "-l", "60", "-i", str(inp),
            "-o", str(tmp_path / "o.fq"), "-m", "3", "--chunk_size", "1",
            "--resume"]
    monkeypatch.setattr(ResumeState, "complete_chunk", crashing)
    with pytest.raises(KeyboardInterrupt):
        cli_main(argv)
    monkeypatch.setattr(ResumeState, "complete_chunk", orig)
    # swap the checkpoint for a different model at the same path
    save_params(str(ck), init_params(jax.random.PRNGKey(3)), {"note": "other"})
    with pytest.raises(RuntimeError, match="different run configuration"):
        cli_main(argv)
