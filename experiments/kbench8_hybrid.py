"""kbench8: hybrid-precision A/B (round-4 verdict #8).

Idea: screen every read with the fastest kernel (x1, one bf16 MXU pass per
step), then rescore ONLY low-margin reads with the argmax-safe x3 (or
bit-exact x6) mode. The existing margin machinery (bench.py parity_ok,
Predictor._maybe_parity_probe) already defines the safety contract: bf16
argmax flips live at small fp32 logit margins, so a margin threshold on the
x1 logits bounds the rescore set.

Measures, on the real chip (B=131072, T=100, packed H2D, 2 feeders,
depth 8 -- the production pipeline shape):

  1. pipelined throughput of x1 / x3 / x6 label emit;
  2. x1 logit-margin distribution on worst-case random reads, and where the
     true x6-vs-x1 argmax flips sit in that distribution;
  3. the smallest margin threshold tau that captures ALL observed flips
     (with safety factor), the rescore fraction at that tau, and the
     implied hybrid throughput  B / (t_x1 + frac * t_rescore).

Conclusion (MEASURED 2026-08-21, axon-tunneled v5e chip, jax 0.9):

  x1 pipelined  1.893 M reads/s
  x3 pipelined  1.847 M reads/s   (same session; bench best this round 2.04 M)
  x6 pipelined  0.597 M reads/s
  flips x1-vs-x6: 312/131072 (2.4e-3), max x1 margin among flips 0.168;
  tau=0.25 is the smallest threshold capturing ALL flips -> rescore 3.28%.
  hybrid(tau=0.25) = 1/(1/1.893M + 0.0328/0.597M) = 1.715 M reads/s.

  VERDICT: NO WIN -- the hybrid is SLOWER than plain x3. In the pipelined
  production shape both x1 and x3 are transfer/launch-bound, so x1's
  kernel-time advantage collapses to +2.5% end to end, while any
  flip-capturing rescore fraction (3.3% at 6x-slower x6) costs more than
  that. Even the unsafe tau=0.1 (misses flips) lands at 1.816 M < x3.
  Keeping --precision {exact,high,fast} exactly as-is: "high"/x3 is
  pareto-optimal on this hardware; "fast"/x1 remains for users who accept
  the documented flip class, "exact"/x6 for bit parity.

Run:  python experiments/kbench8_hybrid.py            (real chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 131072
T = 100
N_BATCHES = 12
DEPTH = 8


def main():
    import jax
    import jax.numpy as jnp

    from ribodetector_tpu import native
    from ribodetector_tpu.models import load_params
    from ribodetector_tpu.ops.dispatch import unpack_b5_tokens
    from ribodetector_tpu.ops.lstm_pallas import bilstm_logits_pallas

    try:
        from ribodetector_tpu.config import cache_dir

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
    tokens = rng.integers(0, 5, (B, T)).astype(np.uint8)
    ptok = native.pack_b5(tokens)
    ptoks = [
        native.pack_b5(rng.integers(0, 5, (B, T)).astype(np.uint8))
        for _ in range(4)
    ]

    def make_infer(mode, emit="labels"):
        @jax.jit
        def infer(p):
            logits = bilstm_logits_pallas(
                params, unpack_b5_tokens(p, T), semantics="dense", matmul=mode
            )
            if emit == "labels":
                return jnp.argmax(logits, axis=1).astype(jnp.int8)
            return logits

        return infer

    # -- margin analysis (one batch, logits) ---------------------------
    lx1 = np.asarray(make_infer("x1", "logits")(jax.device_put(ptok)))
    lx6 = np.asarray(make_infer("x6", "logits")(jax.device_put(ptok)))
    a1, a6 = lx1.argmax(1), lx6.argmax(1)
    flips = a1 != a6
    m1 = np.abs(lx1[:, 1] - lx1[:, 0])
    print(f"x1-vs-x6 flips: {flips.sum()}/{B} ({flips.mean():.2e})")
    if flips.any():
        print(f"max x1 margin among flips: {m1[flips].max():.4f}")
    for tau in (0.05, 0.1, 0.25, 0.5, 1.0):
        cap = (~flips | (m1 < tau)).all()
        print(
            f"tau={tau:<5} rescore_frac={(m1 < tau).mean():.4f} "
            f"captures_all_flips={bool(cap)}"
        )

    # -- pipelined rates ----------------------------------------------
    import queue
    import threading

    def pipelined(infer):
        np.asarray(infer(jax.device_put(ptoks[0])))  # warm
        idxq = queue.Queue()
        for i in range(N_BATCHES):
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
        for _ in range(N_BATCHES):
            np.asarray(outq.get())
        for th in threads:
            th.join()
        return B * N_BATCHES / (time.time() - t0)

    rates = {}
    for mode in ("x1", "x3", "x6"):
        rates[mode] = pipelined(make_infer(mode))
        print(f"{mode} pipelined: {rates[mode] / 1e6:.3f} M reads/s")

    for tau in (0.1, 0.25, 0.5):
        frac = (m1 < tau).mean()
        hyb = 1.0 / (1.0 / rates["x1"] + frac / rates["x6"])
        print(
            f"hybrid(tau={tau}): rescore {100 * frac:.2f}% via x6 -> "
            f"{hyb / 1e6:.3f} M reads/s (x3 alone: {rates['x3'] / 1e6:.3f})"
        )


if __name__ == "__main__":
    main()
