"""End-to-end verification drive: CLI vs torch ground truth (CPU backend)."""

import gzip
import os
import subprocess
import sys
import tempfile

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import torch
import torch.nn as nn

state = torch.load(
    "/root/reference/ribodetector/data/ribodetector_600k_variable_len70_101_epoch47.pth",
    map_location="cpu",
    weights_only=True,
)["state_dict"]
rnn = nn.LSTM(4, 128, 1, batch_first=True, bidirectional=True)
head = nn.Linear(256, 2)
rnn.load_state_dict({k[4:]: v for k, v in state.items() if k.startswith("rnn.")})
head.load_state_dict({k[4:]: v for k, v in state.items() if k.startswith("out.")})
rnn.eval(); head.eval()

BASE = {"A": (1, 0, 0, 0), "C": (0, 1, 0, 0), "G": (0, 0, 1, 0),
        "T": (0, 0, 0, 1), "U": (0, 0, 0, 1)}
ZERO = (0, 0, 0, 0)
T = 100


def torch_labels(seqs):
    x = np.zeros((len(seqs), T, 4), np.float32)
    for i, s in enumerate(seqs):
        for j, b in enumerate(s[:T]):
            x[i, j] = BASE.get(b, ZERO)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        r_out, _ = rnn(xt)
        g = xt.size(1) - 1 - xt.sum(2).flip(1).argmax(1)
        lg = head(r_out[torch.arange(xt.size(0)), g, :])
    return lg.numpy()


rng = np.random.default_rng(7)


def mkread(i):
    L = int(rng.integers(40, 101))
    s = "".join(rng.choice(list("ACGT"), size=L))
    if i % 9 == 0:
        s = s.lower()  # lowercase one-hots to zeros (quirk #1)
    if i % 7 == 0:
        s = s[:-3] + "NNN"
    return s


def fq(seqs, prefix="r"):
    return "".join(
        f"@{prefix}{i} c\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(seqs)
    )


def read_ids(path):
    op = gzip.open if path.endswith("gz") else open
    with op(path, "rt") as fh:
        return [l.split()[0][1:] for i, l in enumerate(fh) if i % 4 == 0]


fails = 0
with tempfile.TemporaryDirectory() as d:
    seqs = [mkread(i) for i in range(180)]
    lg = torch_labels(seqs)
    labels = lg.argmax(1)
    # --- single end, gz in, gz+plain out ---
    inp = os.path.join(d, "in.fq.gz")
    with gzip.open(inp, "wt") as fh:
        fh.write(fq(seqs))
    out, rr = os.path.join(d, "non.fq.gz"), os.path.join(d, "rrna.fq")
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu", "-l", "100",
         "-i", inp, "-o", out, "-r", rr],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        capture_output=True, text=True, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    got0 = set(read_ids(out)); got1 = set(read_ids(rr))
    want0 = {f"r{i}" for i in np.flatnonzero(labels == 0)}
    want1 = {f"r{i}" for i in np.flatnonzero(labels == 1)}
    if got0 != want0 or got1 != want1:
        fails += 1
        print("SINGLE-END MISMATCH", len(got0 ^ want0), len(got1 ^ want1))
    else:
        print(f"single-end ok: {len(got0)} non-rRNA / {len(got1)} rRNA")

    # --- paired end, ensure=both ---
    s1 = [mkread(i + 1000) for i in range(150)]
    s2 = [mkread(i + 2000) for i in range(150)]
    l1, l2 = torch_labels(s1), torch_labels(s2)
    a1, a2 = l1.argmax(1), l2.argmax(1)
    plab = np.where(a1 == a2, a1, -1)
    i1, i2 = os.path.join(d, "r1.fq"), os.path.join(d, "r2.fq.gz")
    with open(i1, "w") as fh:
        fh.write(fq(s1, "p"))
    with gzip.open(i2, "wt") as fh:
        fh.write(fq(s2, "p"))
    o1, o2 = os.path.join(d, "n1.fq"), os.path.join(d, "n2.fq")
    r1p, r2p = os.path.join(d, "rr1.fq.gz"), os.path.join(d, "rr2.fq.gz")
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu", "-l", "100",
         "-i", i1, i2, "-o", o1, o2, "-r", r1p, r2p, "-e", "both"],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        capture_output=True, text=True, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    for path, lab in (
        (o1, 0), (r1p, 1), (o1 + ".unclassified.gz", -1),
        (o2, 0), (r2p, 1), (o2 + ".unclassified.gz", -1),
    ):
        got = set(read_ids(path))
        want = {f"p{i}" for i in np.flatnonzero(plab == lab)}
        if got != want:
            fails += 1
            print(f"PAIRED MISMATCH {path} label={lab}: sym-diff {len(got ^ want)}")
        else:
            print(f"paired {os.path.basename(path)} label={lab} ok: {len(got)} pairs")

    # --- probes ---
    bad = os.path.join(d, "in.txt")
    open(bad, "w").write("x")
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu", "-l", "100",
         "-i", bad, "-o", os.path.join(d, "o.fq")],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        capture_output=True, text=True, timeout=120,
    )
    print("bad-extension probe:", "ok (nonzero exit)" if r.returncode != 0
          else "FAIL: accepted .txt")
    fails += r.returncode == 0

print("VERIFY", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
