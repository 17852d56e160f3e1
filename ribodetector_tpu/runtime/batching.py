"""Batch sizing.

Formula parity with the reference GPU path (reference: ribodetector/detect.py:555-570):

    batch_size = 2 ** floor(log2((mem_GB - 2) * 1024 * 1024 / (k * len * 6.4)))

with k=2 for paired-end, k=1 for single-end. The reference CPU path instead
pins 1024 (detect_cpu.py:596). On TPU the same formula lands in a good range
(m=32, len=100, paired -> 16384 reads/batch), and a power-of-two static shape
is exactly what XLA wants, so the formula is kept as the default policy with
a floor to keep the MXU busy.
"""

import math

MIN_BATCH = 256
MAX_BATCH = 1 << 17


def auto_batch_size(memory_gb: int, read_len: int, is_paired: bool) -> int:
    if read_len < 1:
        # -l is unvalidated upstream (short reads only warn, quirk #12);
        # fail clearly instead of a ZeroDivisionError inside the formula
        raise ValueError(f"read length must be >= 1, got {read_len}")
    k = 2 if is_paired else 1
    raw = ((memory_gb - 2) * 1024 * 1024) / (k * read_len * 6.4)
    if raw < 1:
        return MIN_BATCH
    bs = 2 ** math.floor(math.log2(raw))
    return max(MIN_BATCH, min(MAX_BATCH, bs))
