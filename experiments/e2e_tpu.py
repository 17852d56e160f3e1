"""End-to-end CLI runs on the real TPU chip: throughput + self-consistency.

Run alone (one TPU client at a time!). Two configs:
  A) flagship: 1M paired 100bp reads, gz in, -e both, 6 outputs.
  B) bucketing e2e: 1M single-end mixed 40-300bp FASTA reads at -l 300,
     --buckets auto vs off, byte-compared.
"""

import gzip
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/e2e_tpu"


def gen_paired(n):
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(3)
    lut = np.frombuffer(b"ACGT", np.uint8)
    for side in (1, 2):
        with gzip.open(f"{OUT}/r{side}.fq.gz", "wb", compresslevel=1) as fh:
            for start in range(0, n, 65536):
                m = min(65536, n - start)
                seqs = lut[rng.integers(0, 4, (m, 100))]
                blocks = []
                for i in range(m):
                    s = seqs[i].tobytes()
                    blocks.append(b"@p%d/%d\n%s\n+\n%s\n" % (start + i, side, s, b"I" * 100))
                fh.write(b"".join(blocks))


def gen_fasta(n):
    rng = np.random.default_rng(5)
    lut = np.frombuffer(b"ACGT", np.uint8)
    with open(f"{OUT}/mix.fa", "wb") as fh:
        for start in range(0, n, 65536):
            m = min(65536, n - start)
            lens = rng.integers(40, 301, m)
            big = lut[rng.integers(0, 4, (m, 300))]
            blocks = []
            for i in range(m):
                blocks.append(b">f%d\n%s\n" % (start + i, big[i, : lens[i]].tobytes()))
            fh.write(b"".join(blocks))


def run(args, timeout=900):
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "ribodetector_tpu", *args],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env={**os.environ},
    )
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stderr[-4000:])
        raise SystemExit(f"CLI failed: {args}")
    return dt, r.stderr


def main():
    n = 1_000_000
    print("generating inputs ...")
    gen_paired(n)
    gen_fasta(n)

    print("A) paired 100bp gz, -e both (first run includes compiles+probe)")
    dt_warm, _ = run(["-l", "100", "-i", f"{OUT}/r1.fq.gz", f"{OUT}/r2.fq.gz",
                      "-o", f"{OUT}/o1.fq.gz", f"{OUT}/o2.fq.gz",
                      "-r", f"{OUT}/rr1.fq", f"{OUT}/rr2.fq", "-e", "both"])
    dt, err = run(["-l", "100", "-i", f"{OUT}/r1.fq.gz", f"{OUT}/r2.fq.gz",
                   "-o", f"{OUT}/o1.fq.gz", f"{OUT}/o2.fq.gz",
                   "-r", f"{OUT}/rr1.fq", f"{OUT}/rr2.fq", "-e", "both",
                   "--profile"])
    print(f"   first {dt_warm:.1f}s, cached {dt:.1f}s = {2*n/dt/1e6:.2f} M reads/s e2e")
    print("   profile:", [l for l in err.splitlines() if "stage" in l.lower() or "parse" in l.lower()][-1:])

    print("B) single FASTA mixed 40-300bp, -l 300: buckets auto vs off")
    walls = {}
    for mode in ("auto", "off", "auto"):  # first auto pays bucket compiles
        dt, _ = run(["-l", "300", "-i", f"{OUT}/mix.fa",
                     "-o", f"{OUT}/mo_{mode}.fa", "-r", f"{OUT}/mr_{mode}.fa",
                     "--buckets", mode])
        walls[mode] = dt
    same = (open(f"{OUT}/mo_auto.fa", "rb").read() == open(f"{OUT}/mo_off.fa", "rb").read()
            and open(f"{OUT}/mr_auto.fa", "rb").read() == open(f"{OUT}/mr_off.fa", "rb").read())
    print(f"   off {walls['off']:.1f}s ({n/walls['off']/1e6:.2f} M reads/s), "
          f"auto {walls['auto']:.1f}s ({n/walls['auto']/1e6:.2f} M reads/s), "
          f"outputs identical: {same}")
    if not same:
        # under the default x3 mode the two runs may differ on
        # borderline-margin reads (runtime/buckets.py module doc); a LARGE
        # divergence would indicate a real bug
        print("   note: x3-mode borderline flips are expected to be <1e-4;"
              " inspect the diff if larger")


if __name__ == "__main__":
    main()
