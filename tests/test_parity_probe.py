"""The startup argmax-parity probe: gating, fallback, and marker caching.

The probe only activates when the Pallas kernel will run (TPU backends),
so CPU CI never exercises it naturally; these tests force the path with a
mocked kernel to pin the safety contract: a flip outside the fp32 noise
class falls back to the bit-exact mode and writes NO pass marker, a pass
writes a weight-keyed marker that skips the next probe.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from ribodetector_tpu.config import DEFAULT_CONFIG, ConfigParser
from ribodetector_tpu.runtime.pipeline import Predictor


def _predictor(tmp_path, monkeypatch, flips):
    """Predictor primed for the probe, with a fake kernel whose x3 arm
    flips `flips` high-margin reads vs its x6 arm."""
    monkeypatch.setenv("RIBODETECTOR_TPU_CACHE", str(tmp_path / "cache"))
    import ribodetector_tpu.runtime.pipeline as pl

    args = SimpleNamespace(len=50, ensure="none", log=None, profile=False,
                           semantics=None, precision=None, deviceid=None)
    p = Predictor(ConfigParser.from_json(DEFAULT_CONFIG), args)
    p.get_state_file()
    from ribodetector_tpu.models import load_params

    p.params = load_params(p.state_file)
    p.semantics = "dense"
    p.compute_dtype = "float32"
    p.kernel = "pallas"  # force the probe's gate without a TPU
    p.precision_mode = "high"

    def fake_kernel(params, tokens, lengths=None, *, matmul, **kw):
        B = tokens.shape[0]
        logits = np.zeros((B, 2), np.float32)
        logits[:, 1] = 1.0  # margin 1.0 everywhere (>= 5e-3)
        if matmul == "x3" and flips:
            logits[:flips, 1] = -1.0  # argmax flip on high-margin reads
        return logits

    monkeypatch.setattr(
        "ribodetector_tpu.ops.lstm_pallas.bilstm_logits_pallas", fake_kernel
    )
    return p


def test_probe_falls_back_on_high_margin_flips(tmp_path, monkeypatch):
    p = _predictor(tmp_path, monkeypatch, flips=5)
    p._maybe_parity_probe()
    assert p.precision_mode == "exact"
    # a failure must NOT cache a pass
    cache = tmp_path / "cache"
    assert not any(f.name.startswith("parity_ok") for f in cache.glob("*")) \
        if cache.exists() else True


def test_probe_pass_writes_weight_keyed_marker_and_skips(tmp_path, monkeypatch):
    p = _predictor(tmp_path, monkeypatch, flips=0)
    p._maybe_parity_probe()
    assert p.precision_mode == "high"
    markers = list((tmp_path / "cache").glob("parity_ok_*"))
    assert len(markers) == 1

    # second probe skips entirely (kernel would now fail if called)
    p2 = _predictor(tmp_path, monkeypatch, flips=5)
    calls = {"n": 0}
    real = __import__("ribodetector_tpu.ops.lstm_pallas", fromlist=["x"])

    def counting(*a, **k):
        calls["n"] += 1
        raise AssertionError("probe should have been skipped by the marker")

    monkeypatch.setattr(
        "ribodetector_tpu.ops.lstm_pallas.bilstm_logits_pallas", counting
    )
    p2._maybe_parity_probe()
    assert calls["n"] == 0
    assert p2.precision_mode == "high"


def test_probe_skipped_for_scan_kernel(tmp_path, monkeypatch):
    p = _predictor(tmp_path, monkeypatch, flips=5)
    p.kernel = "scan"
    p._maybe_parity_probe()  # must not touch the (failing) kernel
    assert p.precision_mode == "high"
