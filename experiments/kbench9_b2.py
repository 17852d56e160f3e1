#!/usr/bin/env python3
"""kbench9: 2-bit packed H2D transfer A/B vs the production base-5 format.

Round-4 verdict item: the dominant per-batch transfer ships 3 tokens/byte
(base-5) when clean ACGT-only reads admit 4/byte (2-bit), a straight 25%
cut of the H2D payload. This measures the device-stage pipeline (depth 8,
2 feeder threads, B=131072, T=100 -- bench.py measure_tpu's exact shape)
with both formats, interleaved A/B/A/B so tunnel drift hits both arms.

Run on the real chip (nothing else may touch the tunnel):
    python experiments/kbench9_b2.py
"""

import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T = 131072, 100
N_BATCH = 16
DEPTH = 8
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    from ribodetector_tpu import native
    from ribodetector_tpu.config import cache_dir
    from ribodetector_tpu.models import load_params
    from ribodetector_tpu.ops.dispatch import unpack_b2_tokens, unpack_b5_tokens
    from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas

    try:
        cdir = cache_dir()
        os.makedirs(cdir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cdir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    params = jax.device_put(
        load_params("ribodetector_tpu/data/ribodetector_v1.npz")
    )
    rng = np.random.default_rng(0)
    # clean reads: tokens 0..3 only (the b2-eligible class)
    toks = [rng.integers(0, 4, (B, T)).astype(np.uint8) for _ in range(4)]

    @jax.jit
    def infer_b5(ptok):
        logits = bilstm_logits_pallas(
            params, unpack_b5_tokens(ptok, T), semantics="dense", matmul="x3"
        )
        return jnp.argmax(logits, axis=1).astype(jnp.int8)

    @jax.jit
    def infer_b2(ptok):
        logits = bilstm_logits_pallas(
            params, unpack_b2_tokens(ptok, T), semantics="dense", matmul="x3"
        )
        return jnp.argmax(logits, axis=1).astype(jnp.int8)

    arms = {
        "b5": (infer_b5, [native.pack_b5(t) for t in toks]),
        "b2": (infer_b2, [native.pack_b2(t) for t in toks]),
    }

    # parity: identical labels from both formats on the same tokens
    l5 = np.asarray(infer_b5(jax.device_put(arms["b5"][1][0])))
    l2 = np.asarray(infer_b2(jax.device_put(arms["b2"][1][0])))
    assert (l5 == l2).all(), "b2 unpack must be label-identical on clean reads"
    print(f"# parity ok; payload bytes/batch: b5={arms['b5'][1][0].nbytes}, "
          f"b2={arms['b2'][1][0].nbytes} "
          f"({100 * (1 - arms['b2'][1][0].nbytes / arms['b5'][1][0].nbytes):.1f}% cut)")

    def measure(infer, ptoks):
        idxq = queue.Queue()
        for i in range(N_BATCH):
            idxq.put(i)
        outq = queue.Queue(maxsize=DEPTH)

        def feed():
            while True:
                try:
                    i = idxq.get_nowait()
                except queue.Empty:
                    return
                outq.put(infer(jax.device_put(ptoks[i % len(ptoks)])))

        t0 = time.time()
        threads = [threading.Thread(target=feed) for _ in range(2)]
        for th in threads:
            th.start()
        for _ in range(N_BATCH):
            np.asarray(outq.get())
        for th in threads:
            th.join()
        return B * N_BATCH / (time.time() - t0)

    for name, (infer, ptoks) in arms.items():  # warm both compiled paths
        np.asarray(infer(jax.device_put(ptoks[0])))

    results = {k: [] for k in arms}
    for r in range(ROUNDS):
        for name, (infer, ptoks) in arms.items():
            rate = measure(infer, ptoks)
            results[name].append(rate)
            print(f"round {r} {name}: {rate:,.0f} reads/s", flush=True)

    for name, rates in results.items():
        print(f"{name}: best {max(rates):,.0f}  all "
              f"{[f'{x:,.0f}' for x in rates]}")
    print(f"b2/b5 best ratio: {max(results['b2']) / max(results['b5']):.3f}")


if __name__ == "__main__":
    main()
