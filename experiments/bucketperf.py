"""Measure length-bucketed vs single-shape classify throughput on the chip.

BASELINE config 4 evidence: mixed 40-300bp reads under -l 300. The
unbucketed runtime pays the full 300-step recurrence for every read; the
bucketed runtime runs each read at the smallest fitting bucket
(64/128/192/256/300) with the zero-prefix backward init. Both paths are
measured in the production pipeline shape (packed uint8 H2D, depth-8 in
flight, x3 kernel, label emit). Prints reads/s for both and the ratio.

Run alone (one TPU client at a time!): python experiments/bucketperf.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B = 131072
L = 300
BUCKETS = [64, 128, 192, 256, 300]
DEPTH = 8


def main():
    import os

    try:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "ribodetector_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from ribodetector_tpu import native
    from ribodetector_tpu.models import load_params
    from ribodetector_tpu.models.bilstm import zero_prefix_state
    from ribodetector_tpu.ops.dispatch import unpack_b5_tokens
    from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas

    params = jax.device_put(load_params("ribodetector_tpu/data/ribodetector_v1.npz"))
    rng = np.random.default_rng(0)

    def infer_for(tb, gap):
        init = None
        if gap:
            init = tuple(jax.device_put(x) for x in zero_prefix_state(params, gap))

        @jax.jit
        def infer(ptok):
            logits = bilstm_logits_pallas(
                params,
                unpack_b5_tokens(ptok, tb),
                semantics="dense",
                matmul="x3",
                bwd_init=init,
            )
            return jnp.argmax(logits, axis=1).astype(jnp.int8)

        return infer

    def packed_batch(tb):
        toks = np.full((B, L), 4, np.uint8)
        lens = rng.integers(max(8, tb - 63), tb + 1, B)
        for i in range(0, B, 4096):  # block-fill to keep prep fast
            ln = int(lens[i])
            toks[i : i + 4096, :ln] = rng.integers(0, 5, (min(4096, B - i), ln))
        return native.pack_b5(toks[:, :tb].copy())

    def measure(infer, ptok, n=8):
        infer(jax.device_put(ptok)).block_until_ready()  # warm/compile
        t0 = time.time()
        pending = []
        for _ in range(n):
            pending.append(infer(jax.device_put(ptok)))
            if len(pending) > DEPTH:
                np.asarray(pending.pop(0))
        for out in pending:
            np.asarray(out)
        return (time.time() - t0) / n

    # mixture: uniform read lengths 40..300 -> bucket shares
    lens = rng.integers(40, 301, 1_000_000)
    shares = np.asarray(
        [np.mean((lens > ([0] + BUCKETS)[i]) & (lens <= BUCKETS[i])) for i in range(len(BUCKETS))]
    )
    print("bucket shares:", dict(zip(BUCKETS, np.round(shares, 3))))

    per_bucket = {}
    for tb in BUCKETS:
        dt = measure(infer_for(tb, L - tb), packed_batch(tb))
        per_bucket[tb] = dt
        print(f"T={tb}: {dt*1e3:.1f} ms/batch = {B/dt/1e6:.2f} M reads/s")

    # unbucketed: every read pays the T=300 batch
    base_dt = per_bucket[L]
    base_rps = B / base_dt
    # bucketed: weighted time per B reads
    mix_dt = float((shares * np.asarray([per_bucket[t] for t in BUCKETS])).sum())
    mix_rps = B / mix_dt
    print(
        f"mixed 40-300bp @ -l 300: single-shape {base_rps/1e6:.2f} M reads/s, "
        f"bucketed {mix_rps/1e6:.2f} M reads/s -> {mix_rps/base_rps:.2f}x"
    )


if __name__ == "__main__":
    main()
