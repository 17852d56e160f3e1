#!/usr/bin/env python3
"""Serve-mode job-stream throughput: --concurrency 1 vs 2 (round-4 verdict
weak #5: sequential jobs leave the device idle between jobs).

20 jobs x 200K generated reads through ONE warm server process per arm,
interleaved arms (1,2,1,2) to spread tunnel drift. Reports wall seconds
per arm and jobs/min. Run on the real chip, nothing else on the tunnel:
    python experiments/serve_soak2.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

N_JOBS = 20
READS = 200_000
ROUNDS = 2


def run_arm(d, conc, tag):
    jobs = []
    for j in range(N_JOBS):
        jobs.append(json.dumps({
            "id": j,
            "input": [os.path.join(d, f"in{j % 4}.fq")],
            "output": [os.path.join(d, f"{tag}_o{j}.fq")],
            "rrna": [os.path.join(d, f"{tag}_r{j}.fq")],
        }))
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu.serve", "-l", "100",
         "-t", "2", "--concurrency", str(conc)],
        input="\n".join(jobs) + "\n", capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    wall = time.time() - t0
    resps = [json.loads(l) for l in r.stdout.splitlines()]
    ok = sum(1 for x in resps if x.get("status") == "ok")
    assert ok == N_JOBS, (ok, r.stderr[-2000:])
    assert [x["id"] for x in resps] == list(range(N_JOBS)), "order broken"
    secs = sorted(x["seconds"] for x in resps)
    return wall, secs[len(secs) // 2]


def main():
    d = tempfile.mkdtemp(prefix="rd_serve2_")
    for j in range(4):
        bench._gen_fastq(os.path.join(d, f"in{j}.fq"), READS, seed=20 + j)
    results = {1: [], 2: []}
    for rnd in range(ROUNDS):
        for conc in (1, 2):
            wall, med = run_arm(d, conc, f"{rnd}_{conc}")
            results[conc].append(wall)
            print(f"round {rnd} conc={conc}: wall {wall:.1f}s "
                  f"(median job {med:.2f}s, "
                  f"{N_JOBS / wall * 60:.1f} jobs/min)", flush=True)
    print(json.dumps({
        "conc1_walls": [round(w, 1) for w in results[1]],
        "conc2_walls": [round(w, 1) for w in results[2]],
        "best_jobs_per_min": {
            c: round(N_JOBS / min(w) * 60, 1) for c, w in results.items()
        },
        "best_speedup": round(min(results[1]) / min(results[2]), 3),
    }))
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
