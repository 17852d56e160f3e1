#!/usr/bin/env python3
"""End-to-end A/B of the 2-bit transfer lane (+ lazy window pool).

kbench9 showed the device-stage win is +1-5%; the e2e claim (the round-4
verdict's lever b) is that under host contention the 25% smaller H2D
payload matters more. This drives the REAL CLI over one generated
4M x 100bp FASTQ with runtime.b2 on/off INTERLEAVED (A/B/A/B) so tunnel
drift hits both arms, and reports per-run walls + the startup-to-first-
batch time (the lazy slot pool change).

Run on the real chip, nothing else on the tunnel:
    python experiments/e2e_b2_ab.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)

ROUNDS = 2


def run_one(inp, out, rr, b2):
    from types import SimpleNamespace

    from ribodetector_tpu.config import DEFAULT_CONFIG, ConfigParser
    from ribodetector_tpu.runtime import Predictor

    cfg = ConfigParser.from_json(DEFAULT_CONFIG)
    cfg.config.setdefault("runtime", {})["b2"] = b2
    args = SimpleNamespace(
        len=bench.T, input=[inp], output=[out], rrna=[rr], ensure="none",
        threads=os.cpu_count() or 2, memory=32, chunk_size=None, log=None,
        profile=True, trace_dir=None, resume=False, semantics=None,
        kernel=None, precision=None, buckets=None, hosts=1, host_id=0,
        coordinator=None, num_hosts=None, deviceid=None, config=None,
        barrier_timeout=None,
    )
    p = Predictor(cfg, args)
    p.load_model()
    t0 = time.time()
    p.detect()
    wall = time.time() - t0
    return p._final[0] / wall, wall, dict(p.timer.totals)


def main():
    d = tempfile.mkdtemp(prefix="rd_b2ab_")
    inp = os.path.join(d, "in.fq")
    n = int(os.environ.get("RD_AB_READS", 4_000_000))
    bench._gen_fastq(inp, n)
    # warm both compiled paths (b2 infer is a separate XLA program)
    warm = os.path.join(d, "w.fq")
    bench._gen_fastq(warm, 200_000, seed=8)
    for b2 in (True, False):
        run_one(warm, os.path.join(d, "wo.fq"), os.path.join(d, "wr.fq"), b2)
    results = {True: [], False: []}
    for r in range(ROUNDS):
        for b2 in (True, False):
            rate, wall, stages = run_one(
                inp, os.path.join(d, "o.fq"), os.path.join(d, "r.fq"), b2
            )
            results[b2].append(rate)
            print(
                f"round {r} b2={b2}: {rate:,.0f} reads/s ({wall:.2f}s) "
                f"infer_wait={stages.get('infer_wait', 0):.2f}",
                flush=True,
            )
    print(json.dumps({
        "b2_on": [round(x) for x in results[True]],
        "b2_off": [round(x) for x in results[False]],
        "best_ratio": round(max(results[True]) / max(results[False]), 3),
    }))
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
