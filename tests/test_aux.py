"""Aux components: training-era encode helpers, datasets, tracking, resume."""

import numpy as np
import pytest

from ribodetector_tpu.data_sets import PairedReadData, SeqData, train_val_split
from ribodetector_tpu.encode import encode_batch
from ribodetector_tpu.encode.windows import (
    encode_seq_windows,
    get_read_rc_with_maxlen,
    reverse_complement_tokens,
)
from ribodetector_tpu.train.tracking import MetricTracker, inf_loop


def test_get_read_rc_with_maxlen_long():
    # center crop parity (seq_encoder.py:95-108)
    seq = "A" * 10 + "CGTN" + "T" * 10  # len 24
    read, rc = get_read_rc_with_maxlen(seq, max_len=10)
    assert read == seq[7:17] == "AAACGTNTTT"
    assert rc == "AAANACGTTT"  # reverse complement of the cropped window


def test_get_read_rc_roundtrip():
    read, rc = get_read_rc_with_maxlen("ACGTN", max_len=5)
    assert read == "ACGTN"
    assert rc == "NACGT"
    # short read pads AFTER both read and rc (seq_encoder.py:103-106)
    read, rc = get_read_rc_with_maxlen("ACG", max_len=5)
    assert read == "ACGNN"
    assert rc == "CGTNN"


def test_reverse_complement_tokens():
    tokens, lengths = encode_batch(["ACGT", "AC"], 6)
    rc = reverse_complement_tokens(tokens, lengths)
    t_acgt, _ = encode_batch(["ACGT"[::-1].translate(str.maketrans("ACGT", "TGCA"))], 6)
    np.testing.assert_array_equal(rc[0], t_acgt[0])
    t_gt, _ = encode_batch(["GT"], 6)
    np.testing.assert_array_equal(rc[1], t_gt[0])


def test_encode_seq_windows_parity():
    # reference encode_seq_reads semantics (seq_encoder.py:148-162)
    seq = "ACGT" * 30  # len 120
    wins = encode_seq_windows(seq, step_size=50, max_len=100)
    # i=0: full window; i=50: 70 remaining > 50 -> padded partial; stop
    assert wins.shape == (2, 100)
    full, _ = encode_batch([seq[:100]], 100)
    np.testing.assert_array_equal(wins[0], full[0])
    partial, _ = encode_batch([seq[50:]], 100)
    np.testing.assert_array_equal(wins[1], partial[0])
    # window shorter than half of max_len is dropped
    wins = encode_seq_windows("ACGT" * 10, step_size=100, max_len=100)
    assert wins.shape == (0, 100)


def test_datasets():
    reads = [("@a", "AC"), ("@b", "GG"), ("@c", "TT")]
    ds = SeqData(reads)
    assert len(ds) == 3 and ds[1] == ("@b", "GG")
    assert list(ds.batches(2)) == [reads[:2], reads[2:]]
    pd = PairedReadData((reads, reads))
    assert pd[2] == (("@c", "TT"), ("@c", "TT"))


def test_train_val_split():
    tr, va = train_val_split(100, 0.2, seed=1)
    assert len(va) == 20 and len(tr) == 80
    assert sorted(np.concatenate([tr, va])) == list(range(100))
    tr, va = train_val_split(100, 0, seed=1)
    assert len(va) == 0 and len(tr) == 100
    tr, va = train_val_split(100, 15, seed=1)
    assert len(va) == 15


def test_metric_tracker():
    mt = MetricTracker("loss")
    mt.update("loss", 2.0)
    mt.update("loss", 4.0, n=3)
    assert mt.avg("loss") == pytest.approx((2 + 12) / 4)
    mt.reset()
    assert mt.result() == {"loss": 0.0}


def test_inf_loop():
    it = inf_loop([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]


def test_batch_size_formula_parity():
    # literal reference formula (detect.py:555-570), inside the clamp range
    import math

    from ribodetector_tpu.runtime.batching import auto_batch_size

    for mem, rlen, paired in [(32, 100, True), (32, 100, False), (12, 70, True),
                              (16, 151, False), (64, 250, True)]:
        k = 2 if paired else 1
        ref = 2 ** math.floor(math.log2((mem - 2) * 1024 * 1024 / (k * rlen * 6.4)))
        got = auto_batch_size(mem, rlen, paired)
        assert got == max(256, min(1 << 17, ref))
    # degenerate memory never returns < MIN_BATCH
    assert auto_batch_size(2, 100, True) == 256


def test_config_parser_init_obj_and_logger(tmp_path):
    from ribodetector_tpu import models
    from ribodetector_tpu.config import ConfigParser

    cfg = ConfigParser(
        {"arch": {"type": "load_params", "args": {}}, "x": 1}
    )
    assert cfg["x"] == 1 and cfg.get("missing", 5) == 5
    # init_ftn reflective lookup (parse_config.py:43-57 semantics)
    fn = cfg.init_ftn("arch", models)
    assert callable(fn)
    logfile = str(tmp_path / "run.log")
    logger = cfg.get_logger("t", 2, logfile)
    logger.info("hello-parity")
    for h in list(logger.handlers):
        h.flush()
    assert "hello-parity" in open(logfile).read()


def test_weight_selection_and_short_read_warning():
    # quirk #6: "recall" weights iff ensure == norrna; quirk #12: reads < 40
    # only warn (detect.py:54-71)
    from types import SimpleNamespace

    from ribodetector_tpu.config import ConfigParser
    from ribodetector_tpu.runtime.pipeline import Predictor

    cfg = ConfigParser(
        {"state_file": {"mcc": "data/ribodetector_v1.npz",
                        "recall": "data/ribodetector_v1.npz"}}
    )

    class Rec:
        def __init__(self):
            self.msgs = []

        def info(self, m, *a):
            self.msgs.append(str(m))

        warning = info

    def state_for(ensure, rlen=100):
        args = SimpleNamespace(ensure=ensure, len=rlen, log=None)
        p = Predictor(cfg, args)
        p.logger = Rec()
        p.get_state_file()
        return p, " ".join(p.logger.msgs)

    _, msgs = state_for("norrna")
    assert "RECALL" in msgs
    _, msgs = state_for("none")
    assert "MCC" in msgs
    p, msgs = state_for("none", rlen=20)  # warns, never raises
    assert "shorter than 40" in msgs
    assert p.state_file.endswith(".npz")


def test_param_count_and_describe(ref_params_path):
    from ribodetector_tpu.models import load_params
    from ribodetector_tpu.models.bilstm import (
        describe,
        param_count,
        reference_param_count,
    )

    params = load_params(ref_params_path)
    # 137,730 params in torch layout (BASELINE.md "Model size"); ours merges
    # the redundant bias pairs
    assert reference_param_count(params) == 137730
    assert param_count(params) == 136706
    assert "136706" in describe(params)


def test_resume_empty_input_creates_empty_outputs(tmp_path):
    """An empty input under --resume still produces (empty) output files
    and leaves no manifest -- the run-loop never opens a chunk, so the
    epilogue must create the outputs itself."""
    import os

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    inp = tmp_path / "in.fq"
    inp.write_text("")
    out, rr = tmp_path / "o.fq", tmp_path / "r.fq.gz"
    cli_main(["-l", "60", "-i", str(inp), "-o", str(out), "-r", str(rr),
              "-m", "3", "--chunk_size", "1", "--resume"])
    assert out.exists() and out.stat().st_size == 0
    # the gz output must be a VALID (empty) gzip stream, not 0 bytes --
    # a memberless .gz makes gzip -d fail (reference parity: gzip.open
    # writes an empty member on close)
    import gzip

    assert rr.exists() and rr.stat().st_size > 0
    assert gzip.decompress(rr.read_bytes()) == b""
    assert not os.path.exists(str(out) + ".progress.json")


def test_profile_and_trace_dir_smoke(tmp_path, capfd):
    """--profile logs a per-stage breakdown INCLUDING per-thread worker
    stages (inflate/parse/write run off the main thread; round-4 verdict:
    main-thread timers alone can't answer "what do I tune on N cores");
    --trace-dir captures a jax.profiler trace (SURVEY.md 5: the reference
    has neither)."""
    import gzip as _gzip

    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main

    if not native.available():
        pytest.skip("native extension unavailable")
    inp = tmp_path / "in.fq.gz"
    recs = []
    for i in range(300):
        recs.append(f"@s{i}\n{'ACGT' * 15}\n+\n{'I' * 60}\n")
    with open(inp, "wb") as fh:
        fh.write(_gzip.compress("".join(recs).encode()))
    trace_dir = tmp_path / "trace"
    cli_main(["-l", "60", "-i", str(inp), "-o", str(tmp_path / "o.fq"),
              "-m", "3", "--chunk_size", "1", "--profile",
              "--trace-dir", str(trace_dir)])
    text = capfd.readouterr().err
    assert "stage timings" in text and "infer_wait" in text
    # worker-thread attribution rows (role:stage), with thread counts
    assert "worker threads" in text
    assert "inflate:inflate" in text
    assert "parse:parse_work" in text
    assert "write:write_io" in text
    assert "dispatch:h2d_call" in text
    assert "[1 thread]" in text or "[2 threads]" in text
    # the profiler wrote something under the trace dir
    assert trace_dir.exists()
    assert any(trace_dir.rglob("*")), "trace dir is empty"


def test_writer_disk_error_aborts_cleanly(tmp_path, monkeypatch):
    """A disk-write failure mid-run must abort the run with the original
    error -- no deadlock in the writer's backpressure loop (scratch buffers
    are recycled even on the error path) and no silent truncation."""
    from ribodetector_tpu import native
    from ribodetector_tpu.cli import main as cli_main
    from ribodetector_tpu.io import writer as writer_mod

    if not native.available():
        pytest.skip("native extension unavailable")
    inp = tmp_path / "in.fq"
    with open(inp, "w") as fh:
        for i in range(5000):
            fh.write(f"@w{i}\n{'ACGT' * 15}\n+\n{'I' * 60}\n")

    class FailingAfter:
        """Binary file wrapper that raises after N successful writes."""

        def __init__(self, fh, n):
            self._fh, self._left = fh, n

        def write(self, payload):
            if self._left <= 0:
                raise OSError(28, "No space left on device (simulated)")
            self._left -= 1
            return self._fh.write(payload)

        def flush(self):
            self._fh.flush()

        def tell(self):
            return self._fh.tell()

        def close(self):
            self._fh.close()

    orig = writer_mod.open_for_write_bytes

    def failing_open(path, gz_level=None):
        fh = orig(path, gz_level=gz_level)
        if path.endswith("o.fq"):
            return FailingAfter(fh, 1)
        return fh

    monkeypatch.setattr(writer_mod, "open_for_write_bytes", failing_open)
    import signal

    def alarm(*_):  # the real failure mode this guards: a hang
        raise AssertionError("run deadlocked after write error")

    old = signal.signal(signal.SIGALRM, alarm)
    signal.alarm(120)
    try:
        with pytest.raises(OSError, match="No space left"):
            cli_main(["-l", "60", "-i", str(inp), "-o", str(tmp_path / "o.fq"),
                      "-r", str(tmp_path / "r.fq"), "-m", "3",
                      "--chunk_size", "1", "--kernel", "scan"])
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("key,bad", [("depth", 1), ("depth", 99),
                                     ("dispatchers", 0)])
def test_pipeline_knob_validation(tmp_path, key, bad):
    """Config-sourced runtime.depth / runtime.dispatchers are validated at
    startup (out-of-range values would break the pinned-window budget or
    crash in ThreadPoolExecutor mid-run)."""
    from types import SimpleNamespace

    from ribodetector_tpu import native
    from ribodetector_tpu.config import ConfigParser, DEFAULT_CONFIG
    from ribodetector_tpu.runtime import Predictor

    if not native.available():
        pytest.skip("native extension unavailable")
    cfg = ConfigParser.from_json(DEFAULT_CONFIG)
    cfg.config.setdefault("runtime", {})[key] = bad
    inp = tmp_path / "in.fq"
    inp.write_text("@a\nACGT\n+\nIIII\n")
    args = SimpleNamespace(
        len=60, input=[str(inp)], output=[str(tmp_path / "o.fq")], rrna=None,
        ensure="none", threads=1, memory=3, chunk_size=1, log=None,
        profile=False, trace_dir=None, resume=False, semantics=None,
        kernel="scan", precision=None, buckets=None, hosts=1, host_id=0,
        coordinator=None, num_hosts=None, deviceid=None, config=None,
        gz_level=None, barrier_timeout=None,
    )
    p = Predictor(cfg, args)
    p.load_model()
    with pytest.raises(RuntimeError, match=f"runtime.{key}"):
        p.detect()


def test_chunk_size_zero_and_single_host_coordinator_rejected(tmp_path):
    """--chunk_size 0 would silently process nothing; coordinator with
    hosts<2 would let the merge epilogue truncate real outputs. Both are
    programmatically reachable (SimpleNamespace callers) and must fail
    loudly (round-4 review findings)."""
    from types import SimpleNamespace

    from ribodetector_tpu.config import ConfigParser, DEFAULT_CONFIG
    from ribodetector_tpu.runtime import Predictor

    inp = tmp_path / "in.fq"
    inp.write_text("@a\nACGT\n+\nIIII\n")

    def mkargs(**over):
        base = dict(
            len=60, input=[str(inp)], output=[str(tmp_path / "o.fq")],
            rrna=None, ensure="none", threads=1, memory=3, chunk_size=1,
            log=None, profile=False, trace_dir=None, resume=False,
            semantics=None, kernel="scan", precision=None, buckets=None,
            hosts=1, host_id=0, coordinator=None, num_hosts=None,
            deviceid=None, config=None, gz_level=None, barrier_timeout=None,
        )
        base.update(over)
        return SimpleNamespace(**base)

    p = Predictor(ConfigParser.from_json(DEFAULT_CONFIG), mkargs(chunk_size=0))
    p.load_model()
    with pytest.raises(RuntimeError, match="chunk_size"):
        p.detect()

    p = Predictor(
        ConfigParser.from_json(DEFAULT_CONFIG),
        mkargs(coordinator="127.0.0.1:1", hosts=1),
    )
    p.load_model()
    with pytest.raises(RuntimeError, match="hosts >= 2"):
        p.detect()


def test_small_guard_fixes_round4():
    """Round-4 review guards: -l 0 gets a clear error (not
    ZeroDivisionError); oversized meshes are refused (not silently
    truncated); converter validates src/dst pairs and .npz extension;
    get_logger is additive (a second call must not detach an earlier
    --log file handler)."""
    import logging

    import pytest as _pytest

    from ribodetector_tpu.runtime.batching import auto_batch_size

    with _pytest.raises(ValueError, match="read length"):
        auto_batch_size(32, 0, False)

    from ribodetector_tpu.parallel.mesh import make_data_mesh

    with _pytest.raises(ValueError, match="device"):
        make_data_mesh(999)

    from ribodetector_tpu.models.convert import main as conv_main

    with _pytest.raises(SystemExit, match="npz source"):
        conv_main(["ckpt.pth", "out.onnx"])
    with _pytest.raises(SystemExit, match="both .npz"):
        conv_main(["a.npz", "b.npz"])

    import tempfile

    from ribodetector_tpu.config import ConfigParser

    cfg = ConfigParser({})
    with tempfile.TemporaryDirectory() as d:
        logf = f"{d}/run.log"
        logger = cfg.get_logger("t1", 1, logf)
        logger.info("first-entry")
        cfg.get_logger("t2", 1, None)  # must NOT detach the file handler
        logger2 = cfg.get_logger("t3", 1, logf)  # no duplicate handler
        logger2.info("second-entry")
        for h in logging.getLogger().handlers:
            h.flush()
        text = open(logf).read()
        assert "first-entry" in text and "second-entry" in text
        assert text.count("second-entry") == 1  # no handler duplication
