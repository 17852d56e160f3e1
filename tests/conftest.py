"""Test harness config: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since real multi-chip
TPU hardware is not available in CI. Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; config.update
# is the reliable way to pin tests to the virtual 8-device CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ref_params_path():
    from pathlib import Path

    return str(
        Path(__file__).resolve().parent.parent
        / "ribodetector_tpu"
        / "data"
        / "ribodetector_v1.npz"
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_reads(rng, n, lmin=15, lmax=101, alphabet="ACGTUNacgt"):
    bases = np.array(list(alphabet))
    return [
        "".join(rng.choice(bases, size=rng.integers(lmin, lmax + 1)))
        for _ in range(n)
    ]


@pytest.fixture(scope="session")
def torch_reference():
    """The reference model rebuilt in torch from the official checkpoint.

    Serves as ground truth for logits under both gather semantics
    (reference: ribodetector/model/model.py:32-37 packed,
    ribodetector/model/model_cpu.py:29-37,57-62 dense).
    """
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from torch.nn.utils.rnn import pack_sequence

    pth = "/root/reference/ribodetector/data/ribodetector_600k_variable_len70_101_epoch47.pth"
    if not os.path.exists(pth):
        pytest.skip("reference checkpoint not available")
    state = torch.load(pth, map_location="cpu", weights_only=True)["state_dict"]
    rnn = nn.LSTM(4, 128, 1, batch_first=True, bidirectional=True)
    head = nn.Linear(256, 2)
    rnn.load_state_dict({k[4:]: v for k, v in state.items() if k.startswith("rnn.")})
    head.load_state_dict({k[4:]: v for k, v in state.items() if k.startswith("out.")})
    rnn.eval()
    head.eval()

    def dense_logits(x_onehot):
        with torch.no_grad():
            xt = torch.from_numpy(x_onehot)
            r_out, _ = rnn(xt)
            g = xt.size(1) - 1 - xt.sum(2).flip(1).argmax(1)
            last = r_out[torch.arange(xt.size(0)), g, :]
            return head(last).numpy()

    def packed_logits(x_onehot, lengths):
        with torch.no_grad():
            seq_list = [
                torch.from_numpy(x_onehot[i, : max(int(lengths[i]), 1)])
                for i in range(x_onehot.shape[0])
            ]
            packed = pack_sequence(seq_list, enforce_sorted=False)
            r_out, _ = rnn(packed)
            bs = r_out.batch_sizes
            idx = torch.arange(bs[0])
            lens = ((idx + 1)[:, None] <= bs[None, :]).long().sum(1)
            cum = torch.cat([bs.new_zeros(2), torch.cumsum(bs, 0)])
            li = (cum[lens] + idx)[r_out.unsorted_indices]
            return head(r_out.data[li]).numpy()

    return dense_logits, packed_logits
