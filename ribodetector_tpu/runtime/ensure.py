"""Paired-end ensure-mode reconciliation, vectorized.

Truth-table parity with the reference (reference: ribodetector/detect.py:600-663,
numpy twin detect_cpu.py:617-684). Label 0 = non-rRNA, 1 = rRNA (quirk #10);
-1 marks discordant pairs under ensure="both" (written to
`<output>.unclassified.gz`, quirk #5).

The reference loops read-by-read in Python; here the decision is one
vectorized numpy expression over the batch logits, and read bucketing is a
single stable pass preserving input order (the reference GPU path's
deterministic ordering -- SURVEY.md 5 "race detection").
"""

import numpy as np

ENSURE_MODES = ("rrna", "norrna", "both", "none")


def paired_final_labels(r1_logits, r2_logits, ensure: str):
    """Final per-pair labels from the two ends' [B, 2] logits.

    - "rrna":   1 iff both ends argmax to 1, else 0 (detect.py:620-630)
    - "norrna": 0 iff both ends argmax to 0, else 1 (detect.py:631-641)
    - "both":   concordant label, else -1            (detect.py:642-654)
    - "none":   argmax(r1_logits + r2_logits) -- raw logit SUM, not mean of
                probabilities (quirk #4, detect.py:657)
    """
    r1_logits = np.asarray(r1_logits)
    r2_logits = np.asarray(r2_logits)
    if ensure == "none" or ensure is None:
        return np.argmax(r1_logits + r2_logits, axis=1).astype(np.int64)
    a1 = np.argmax(r1_logits, axis=1)
    a2 = np.argmax(r2_logits, axis=1)
    if ensure == "rrna":
        return np.where((a1 == 1) & (a2 == 1), 1, 0).astype(np.int64)
    if ensure == "norrna":
        return np.where((a1 == 0) & (a2 == 0), 0, 1).astype(np.int64)
    if ensure == "both":
        return np.where(a1 == a2, a1, -1).astype(np.int64)
    raise ValueError(f"unknown ensure mode: {ensure}")


def paired_final_labels_jnp(r1_logits, r2_logits, ensure: str):
    """Device-side (jax.numpy) twin of paired_final_labels: lets the native
    runtime reconcile pairs on-TPU and ship back one int8 label per pair
    instead of [2B, 2] fp32 logits (8x less device->host traffic)."""
    import jax.numpy as jnp

    if ensure == "none" or ensure is None:
        return jnp.argmax(r1_logits + r2_logits, axis=1).astype(jnp.int8)
    a1 = jnp.argmax(r1_logits, axis=1)
    a2 = jnp.argmax(r2_logits, axis=1)
    if ensure == "rrna":
        return jnp.where((a1 == 1) & (a2 == 1), 1, 0).astype(jnp.int8)
    if ensure == "norrna":
        return jnp.where((a1 == 0) & (a2 == 0), 0, 1).astype(jnp.int8)
    if ensure == "both":
        return jnp.where(a1 == a2, a1, -1).astype(jnp.int8)
    raise ValueError(f"unknown ensure mode: {ensure}")


def separate_reads(records, labels):
    """Bucket records by label, preserving input order.

    Returns {label: [record_text, ...]} with record_text = '\n'.join(lines)
    (reference: detect.py:600-614; record join quirk #11).
    """
    buckets = {}
    for rec, label in zip(records, labels):
        buckets.setdefault(int(label), []).append("\n".join(rec))
    return buckets


def separate_paired_reads(r1_records, r1_logits, r2_records, r2_logits, ensure):
    """Reconcile + bucket both ends. Returns (r1_buckets, r2_buckets)."""
    labels = paired_final_labels(r1_logits, r2_logits, ensure)
    return separate_reads(r1_records, labels), separate_reads(r2_records, labels)
