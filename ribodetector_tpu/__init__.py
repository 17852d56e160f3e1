"""TPU-native rRNA read-classification engine.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of
hzi-bifo/RiboDetector (reference: /root/reference, v0.3.1): streaming
FASTQ/FASTA short reads through a vectorized host-side encoder into a
single-layer bidirectional LSTM binary classifier (rRNA vs non-rRNA)
executed as a fused Pallas cell-scan on TPU, with paired-end ensure-mode
reconciliation and deterministic split outputs.

Unlike the reference (two near-duplicate runtimes, detect.py / detect_cpu.py),
this package has ONE engine layered as:

  io/        host-side streaming FASTQ/FASTA parse + gzip + writers
  encode/    vectorized byte->token encoding (LUT, no per-base Python)
  models/    BiLSTM parameter pytree, lax.scan reference forward, converters
  ops/       Pallas TPU kernels (fused bidirectional LSTM scan)
  parallel/  jax.sharding mesh utilities, sharded inference step
  runtime/   chunked streaming pipeline, ensure-mode logic, batching
  train/     loss/metrics/trainer (reference ships only vestigial stubs)
  cli.py     `ribodetector`-compatible command line
"""

__version__ = "0.1.0"
