"""Does deeper in-flight pipelining close the H2D gap? (scratch)"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ribodetector_tpu import native
from ribodetector_tpu.models import load_params
from ribodetector_tpu.ops.dispatch import unpack_b5_tokens
from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas

B, T = 131072, 100
params = jax.device_put(load_params("/root/repo/ribodetector_tpu/data/ribodetector_v1.npz"))
rng = np.random.default_rng(0)


@jax.jit
def infer(ptok):
    logits = bilstm_logits_pallas(
        params, unpack_b5_tokens(ptok, T), semantics="dense", matmul="x3"
    )
    return jnp.argmax(logits, axis=1).astype(jnp.int32)


ptoks = [native.pack_b5(rng.integers(0, 5, (B, T)).astype(np.uint8)) for _ in range(4)]
np.asarray(infer(jax.device_put(ptoks[0])))  # warm

N = 16
for depth in (1, 2, 3):
    t0 = time.time()
    pending = []
    for i in range(N):
        out = infer(jax.device_put(ptoks[i % len(ptoks)]))
        pending.append(out)
        if len(pending) > depth:
            np.asarray(pending.pop(0))
    for o in pending:
        np.asarray(o)
    dt = (time.time() - t0) / N
    print(f"depth={depth}: {dt*1e3:8.2f} ms/batch  {B/dt/1e3:8.1f} K reads/s")

# also: device-resident input (no H2D at all) = upper bound
dev = [jax.device_put(p) for p in ptoks]
t0 = time.time()
pending = None
for i in range(N):
    out = infer(dev[i % 4])
    if pending is not None:
        np.asarray(pending)
    pending = out
np.asarray(pending)
dt = (time.time() - t0) / N
print(f"no-H2D bound: {dt*1e3:8.2f} ms/batch  {B/dt/1e3:8.1f} K reads/s")
