"""-d/--deviceid: the chip-restriction flag must take effect or fail loudly.

Round-2 weakness: the flag was set via os.environ.setdefault only, so a
pre-set env var or an already-initialized backend silently ignored it.
Reference counterpart: CUDA device gating in detect.py:90-91.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mini_input(tmp_path):
    p = tmp_path / "in.fq"
    p.write_text("@a\nACGTACGTAC\n+\nIIIIIIIIII\n")
    return p


def test_deviceid_env_conflict_fails_loudly(tmp_path, monkeypatch):
    from ribodetector_tpu.cli import main as cli_main

    monkeypatch.setenv("TPU_VISIBLE_DEVICES", "1")
    with pytest.raises(SystemExit, match="conflicts with"):
        cli_main(["-l", "50", "-i", str(_mini_input(tmp_path)),
                  "-o", str(tmp_path / "o.fq"), "-d", "0"])


def test_deviceid_after_backend_init_fails_loudly(tmp_path, monkeypatch):
    import jax

    jax.devices()  # ensure the backend is live in this process
    monkeypatch.delenv("TPU_VISIBLE_DEVICES", raising=False)
    from ribodetector_tpu.cli import main as cli_main

    with pytest.raises(SystemExit, match="already\\s+initialized"):
        cli_main(["-l", "50", "-i", str(_mini_input(tmp_path)),
                  "-o", str(tmp_path / "o.fq"), "-d", "0"])


def test_deviceid_on_cpu_backend_warns_and_runs(tmp_path):
    """Fresh process, CPU backend: -d cannot restrict anything, so the run
    proceeds with an explicit warning instead of silently pretending."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    env.pop("TPU_VISIBLE_DEVICES", None)
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu", "-l", "50",
         "-i", str(_mini_input(tmp_path)), "-o", str(tmp_path / "o.fq"),
         "-d", "0", "--kernel", "scan"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no effect on the cpu backend" in r.stderr
    assert (tmp_path / "o.fq").exists()
