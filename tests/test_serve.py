"""Server mode: one loaded model serving many jobs over JSONL."""

import io
import json

import numpy as np
import pytest

from ribodetector_tpu import native
from tests.conftest import random_reads
from tests.test_cli_end2end import read_headers, write_fastq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable"
)


def run_server(jobs, argv):
    from ribodetector_tpu.serve import main

    out = io.StringIO()
    main(argv, stdin=[json.dumps(j) + "\n" for j in jobs], stdout=out)
    return [json.loads(l) for l in out.getvalue().splitlines()]


def test_serve_multiple_jobs_and_error_isolation(tmp_path, rng, torch_reference):
    dense_logits, _ = torch_reference
    from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np

    LEN = 60
    # job 1: single-end
    seqs1 = random_reads(rng, 60, lmin=20, lmax=LEN)
    names1 = [f"a{i}" for i in range(len(seqs1))]
    write_fastq(tmp_path / "in1.fq", names1, seqs1)
    t1, _ = encode_batch(seqs1, LEN)
    lab1 = dense_logits(tokens_to_onehot_np(t1)).argmax(1)

    # job 3: paired -e both
    seqsA = random_reads(rng, 40, lmin=20, lmax=LEN)
    seqsB = random_reads(rng, 40, lmin=20, lmax=LEN)
    namesP = [f"p{i}" for i in range(40)]
    write_fastq(tmp_path / "r1.fq", namesP, seqsA)
    write_fastq(tmp_path / "r2.fq", namesP, seqsB)
    tA, _ = encode_batch(seqsA, LEN)
    tB, _ = encode_batch(seqsB, LEN)
    aA = dense_logits(tokens_to_onehot_np(tA)).argmax(1)
    aB = dense_logits(tokens_to_onehot_np(tB)).argmax(1)
    want_pair = np.where(aA == aB, aA, -1)

    jobs = [
        {"id": 1, "input": [str(tmp_path / "in1.fq")],
         "output": [str(tmp_path / "o1.fq")],
         "rrna": [str(tmp_path / "rr1.fq")]},
        {"id": 2, "input": [str(tmp_path / "missing.fq")],
         "output": [str(tmp_path / "x.fq")]},  # per-job failure
        {"id": 3, "input": [str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")],
         "output": [str(tmp_path / "po1.fq"), str(tmp_path / "po2.fq")],
         "rrna": [str(tmp_path / "pr1.fq"), str(tmp_path / "pr2.fq")],
         "ensure": "both"},
        {"id": 4, "input": [str(tmp_path / "in1.fq")],
         "output": [str(tmp_path / "o4.fq")]},  # server alive after error
    ]
    resps = run_server(jobs, ["-l", str(LEN), "--kernel", "scan", "-m", "3"])
    assert [r["id"] for r in resps] == [1, 2, 3, 4]
    assert resps[0]["status"] == "ok" and resps[0]["num_read"] == 60
    assert resps[1]["status"] == "error" and "missing.fq" in resps[1]["error"]
    assert resps[2]["status"] == "ok" and resps[2]["num_read"] == 40
    assert resps[3]["status"] == "ok"

    # job outputs match the torch reference partition
    assert read_headers(tmp_path / "o1.fq") == [
        f"@{n}" for n, l in zip(names1, lab1) if l == 0
    ]
    assert read_headers(tmp_path / "rr1.fq") == [
        f"@{n}" for n, l in zip(names1, lab1) if l == 1
    ]
    for out, lab in ((tmp_path / "po1.fq", 0), (tmp_path / "pr1.fq", 1)):
        assert read_headers(out) == [
            f"@{n}" for n, l in zip(namesP, want_pair) if l == lab
        ]
    # -e both discordant pairs land in .unclassified.gz (quirk #5)
    import gzip

    unclf = str(tmp_path / "po1.fq") + ".unclassified.gz"
    with gzip.open(unclf, "rt") as fh:
        got_unclf = [l.strip() for i, l in enumerate(fh) if i % 4 == 0]
    assert got_unclf == [f"@{n}" for n, l in zip(namesP, want_pair) if l == -1]
    assert resps[2]["counts"]["unclf"] == len(got_unclf)


def test_serve_reuses_compiled_steps(tmp_path, rng):
    """The second identical-shape job must reuse the first job's traced
    steps (Predictor._build_infer memo) -- same function objects."""
    from ribodetector_tpu.config import DEFAULT_CONFIG, ConfigParser
    from ribodetector_tpu.serve import Server, build_arg_parser

    seqs = random_reads(rng, 30, lmin=20, lmax=50)
    write_fastq(tmp_path / "in.fq", [f"s{i}" for i in range(30)], seqs)
    args = build_arg_parser().parse_args(["-l", "50", "--kernel", "scan", "-m", "3"])
    srv = Server(args, ConfigParser.from_json(DEFAULT_CONFIG))
    job = {"input": [str(tmp_path / "in.fq")],
           "output": [str(tmp_path / "o.fq")]}
    assert srv.run_job(job)["status"] == "ok"
    p = srv._predictors["mcc"]
    cache_after_first = dict(p._infer_cache)
    assert cache_after_first  # steps were traced and memoized
    assert srv.run_job(job)["status"] == "ok"
    assert p._infer_cache == cache_after_first  # no re-trace
    # and mcc/recall alias one Predictor under the shipped config
    job2 = {**job, "output": [str(tmp_path / "o2.fq")], "ensure": "norrna"}
    assert srv.run_job(job2)["status"] == "ok"
    assert srv._predictors["recall"] is p


def test_serve_failed_jobs_do_not_leak(tmp_path, rng):
    """Failed jobs in the long-lived server must not accumulate threads or
    file descriptors (round-4 review finding: a failing run previously
    leaked the writer thread + deflate pool, prefetcher/decomp threads and
    open handles per job)."""
    import gzip
    import os
    import threading

    from ribodetector_tpu.config import DEFAULT_CONFIG, ConfigParser
    from ribodetector_tpu.serve import Server, build_arg_parser

    seqs = random_reads(rng, 2000, lmin=30, lmax=60)
    write_fastq(tmp_path / "good.fq", [f"s{i}" for i in range(2000)], seqs)
    # a gz input truncated mid-stream fails partway THROUGH a run (the
    # pipeline is already up: writer, prefetchers, handles all live)
    blob = gzip.compress((tmp_path / "good.fq").read_bytes())
    (tmp_path / "bad.fq.gz").write_bytes(blob[: len(blob) // 2])

    args = build_arg_parser().parse_args(["-l", "60", "--kernel", "scan", "-m", "3"])
    srv = Server(args, ConfigParser.from_json(DEFAULT_CONFIG))
    good = {"input": [str(tmp_path / "good.fq")],
            "output": [str(tmp_path / "o.fq")]}
    bad = {"input": [str(tmp_path / "bad.fq.gz")],
           "output": [str(tmp_path / "x.fq")]}
    assert srv.run_job(good)["status"] == "ok"

    def fd_count():
        return len(os.listdir("/proc/self/fd"))

    def run_bad():
        # run_job raises per job; the serve() loop is what isolates errors
        with pytest.raises(Exception, match="end-of-stream"):
            srv.run_job(bad)

    for _ in range(3):  # settle pools/caches
        run_bad()
    t0, f0 = threading.active_count(), fd_count()
    for _ in range(6):
        run_bad()
    t1, f1 = threading.active_count(), fd_count()
    assert t1 - t0 <= 2, (t0, t1)  # no per-job thread growth
    assert f1 - f0 <= 2, (f0, f1)  # no per-job fd growth
    assert srv.run_job(good)["status"] == "ok"  # still healthy


def test_serve_rejects_malformed_requests(tmp_path, rng):
    """Scalar-string paths (would explode per character) and chunk_size 0
    (would silently mean whole-file) answer status=error with actionable
    messages; the server keeps serving."""
    seqs = random_reads(rng, 20, lmin=20, lmax=50)
    write_fastq(tmp_path / "in.fq", [f"s{i}" for i in range(20)], seqs)
    good = {"id": 9, "input": [str(tmp_path / "in.fq")],
            "output": [str(tmp_path / "ok.fq")]}
    jobs = [
        {"id": 1, "input": str(tmp_path / "in.fq"),  # scalar string
         "output": [str(tmp_path / "o.fq")]},
        {"id": 2, "input": [str(tmp_path / "in.fq")],
         "output": [str(tmp_path / "o.fq")], "chunk_size": 0},
        {"id": 3, "input": [str(tmp_path / "in.fq")],
         "output": [str(tmp_path / "o.fq")], "ensure": "bogus"},
        good,
    ]
    resps = run_server(jobs, ["-l", "50", "--kernel", "scan", "-m", "3"])
    assert [r["status"] for r in resps] == ["error", "error", "error", "ok"]
    assert "LIST of paths" in resps[0]["error"]
    assert "chunk_size" in resps[1]["error"]
    assert "ensure" in resps[2]["error"]


def test_serve_concurrency_two_overlaps_jobs(tmp_path, rng, torch_reference):
    """--concurrency 2: responses come back in request order with correct
    per-job results (each job runs on a Predictor copy; a failing job in
    the middle stays isolated), and the same golden partition holds."""
    dense_logits, _ = torch_reference
    from ribodetector_tpu.encode import encode_batch, tokens_to_onehot_np

    LEN = 60
    seqs = random_reads(rng, 80, lmin=20, lmax=LEN)
    names = [f"c{i}" for i in range(len(seqs))]
    t, _ = encode_batch(seqs, LEN)
    want = dense_logits(tokens_to_onehot_np(t)).argmax(1)

    jobs = []
    for j in range(6):
        inp = tmp_path / f"cin{j}.fq"
        write_fastq(inp, names, seqs)
        jobs.append({
            "id": j,
            "input": [str(inp)],
            "output": [str(tmp_path / f"co{j}.fq")],
            "rrna": [str(tmp_path / f"cr{j}.fq")],
        })
    jobs.insert(3, {"id": 99, "input": [str(tmp_path / "nope.fq")],
                    "output": [str(tmp_path / "x.fq")]})

    resps = run_server(
        jobs, ["-l", str(LEN), "-t", "2", "--concurrency", "2",
               "--kernel", "scan"],
    )
    assert [r["id"] for r in resps] == [0, 1, 2, 99, 3, 4, 5]
    assert resps[3]["status"] == "error"
    for r in resps:
        if r["id"] == 99:
            continue
        assert r["status"] == "ok", r
        assert r["num_read"] == len(seqs)
        assert r["counts"]["rrna"] == int((want == 1).sum())
    # every job's partition matches the torch golden
    for j in range(6):
        got_r = set(read_headers(tmp_path / f"cr{j}.fq"))
        want_r = {f"@c{i}" for i in range(len(seqs)) if want[i] == 1}
        assert got_r == want_r
