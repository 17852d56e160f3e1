"""Length-bucketed batching: bucket grid + per-record router.

BASELINE config 4 ("variable-length reads (40-300bp) with length-bucketed
batching"). The reference pads every read to -l and always pays the full
recurrence (reference: ribodetector/data_loader/seq_encoder.py:130-145 zero
padding; detect_cpu.py:686-708 runs the ONNX LSTM over the whole padded
matrix). On TPU the recurrence cost is linear in the padded T, so a run of
mostly-100bp reads under -l 300 wastes 3x the step count. Buckets fix that
with a SMALL set of static shapes (one XLA compile each, shared persistent
cache) and zero semantic drift:

- packed semantics: exact by construction (the backward direction starts at
  the true last base; extra pad steps never touch the carry).
- dense semantics: exact via the zero-prefix backward-carry init
  (models/bilstm.py zero_prefix_state): zero-input steps depend only on
  their count, so T_bucket + precomputed state after (max_len - T_bucket)
  zero steps == the full max_len recurrence. Bit-for-bit under exact fp32
  arithmetic (the scan kernel and the Pallas "exact"/x6 mode, pinned by
  tests). Under the default "high"/x3 mode the init is computed in exact
  fp32 while an UNBUCKETED x3 run computes those same prefix steps in
  split arithmetic, so bucketed-x3 and unbucketed-x3 can differ in the
  last ulps -- the bucketed run is the one closer to the fp32 reference,
  and any argmax difference sits in the same borderline-margin noise class
  the x3 parity gate already governs (ops/lstm_pallas.py "x3").
- all-zero reads (no A/C/G/T/U base at all) gather at T-1 by the reference's
  argmax-of-zeros quirk, which IS bucket-dependent -- the router pins them
  to the full bucket. They are detected for free: an all-zero read's base-5
  packed row is PAD_B5 in every byte.
"""

import numpy as np

PAD_B5 = 124  # base-5 packed all-pad trio: 4 + 5*4 + 25*4
_GRID_STEP = 64


def choose_buckets(max_len, spec="auto"):
    """Ascending padded-T bucket list ending in max_len, or None when
    bucketing is off / degenerate.

    spec: "auto" (64-step grid up to max_len), "off", or a comma list of
    ints (the full bucket is always appended).
    """
    if spec in (None, "off", "none"):
        return None
    if spec == "auto":
        buckets = sorted({t for t in range(_GRID_STEP, max_len, _GRID_STEP)} | {max_len})
    else:
        try:
            user = {int(t) for t in str(spec).split(",") if t.strip()}
        except ValueError:
            raise ValueError(f"--buckets expects auto|off|comma-ints, got {spec!r}")
        if any(t < 1 or t > max_len for t in user):
            raise ValueError(f"--buckets entries must be in [1, {max_len}]")
        buckets = sorted(user | {max_len})
    if len(buckets) > 32767:
        # route_records returns int16 bucket indices; a longer list would
        # wrap the index and silently drop records from inference
        raise ValueError(
            f"--buckets supports at most 32767 entries, got {len(buckets)}"
        )
    return buckets if len(buckets) > 1 else None


def route_records(lengths, ptokens, buckets, max_len):
    """Per-record bucket index for one chunk segment.

    lengths: [n] int32 raw read lengths (already truncated to max_len by the
    parser). ptokens: [n, packed_len] uint8 base-5 rows (for the all-zero
    override). Returns [n] int16 bucket indices into `buckets` (int16 so a
    long user-supplied --buckets list cannot wrap the index; buckets are
    ints in [1, max_len] so len(buckets) <= max_len << 32767 always fits).
    """
    eff = np.minimum(lengths, max_len)
    idx = np.searchsorted(np.asarray(buckets), eff, side="left").astype(np.int16)
    # all-zero reads (every packed byte is the pad trio) must run the full
    # recurrence so their T-1 gather lands at max_len-1
    allpad = (ptokens == PAD_B5).all(axis=1)
    if allpad.any():
        idx[allpad] = len(buckets) - 1
    return idx
