"""Ensure-mode truth-table parity (reference: detect.py:600-663)."""

import numpy as np
import pytest

from ribodetector_tpu.runtime.ensure import (
    paired_final_labels,
    separate_paired_reads,
    separate_reads,
)

# logits chosen so argmax is unambiguous
NO = np.array([3.0, -1.0])  # argmax 0 (non-rRNA)
YES = np.array([-1.0, 3.0])  # argmax 1 (rRNA)


def pairs(*combos):
    l1 = np.stack([a for a, b in combos])
    l2 = np.stack([b for a, b in combos])
    return l1, l2


ALL_COMBOS = [(NO, NO), (NO, YES), (YES, NO), (YES, YES)]


def test_rrna_mode():
    l1, l2 = pairs(*ALL_COMBOS)
    # rRNA iff both ends say rRNA (detect.py:620-630)
    np.testing.assert_array_equal(paired_final_labels(l1, l2, "rrna"), [0, 0, 0, 1])


def test_norrna_mode():
    l1, l2 = pairs(*ALL_COMBOS)
    # non-rRNA iff both ends say non-rRNA (detect.py:631-641)
    np.testing.assert_array_equal(paired_final_labels(l1, l2, "norrna"), [0, 1, 1, 1])


def test_both_mode():
    l1, l2 = pairs(*ALL_COMBOS)
    # discordant pairs -> -1 (detect.py:642-654)
    np.testing.assert_array_equal(paired_final_labels(l1, l2, "both"), [0, -1, -1, 1])


def test_none_mode_uses_raw_logit_sum():
    # quirk #4: argmax of the logit SUM, not the mean of probabilities
    l1 = np.array([[5.0, 0.0], [1.0, 0.0]])
    l2 = np.array([[0.0, 1.0], [0.0, 3.0]])
    np.testing.assert_array_equal(paired_final_labels(l1, l2, "none"), [0, 1])


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        paired_final_labels(NO[None], NO[None], "bogus")


def test_separate_reads_preserves_order_and_joins():
    records = [("@a", "AC", "+", "II"), ("@b", "GG", "+", "II"), ("@c", "TT", "+", "II")]
    buckets = separate_reads(records, [1, 0, 1])
    assert buckets[0] == ["@b\nGG\n+\nII"]
    assert buckets[1] == ["@a\nAC\n+\nII", "@c\nTT\n+\nII"]


def test_separate_paired_reads_pairs_stay_together():
    r1 = [("@a/1", "AC"), ("@b/1", "GG")]
    r2 = [("@a/2", "CA"), ("@b/2", "CC")]
    l1, l2 = pairs((YES, NO), (YES, YES))
    d1, d2 = separate_paired_reads(r1, l1, r2, l2, "both")
    assert d1[-1] == ["@a/1\nAC"] and d2[-1] == ["@a/2\nCA"]
    assert d1[1] == ["@b/1\nGG"] and d2[1] == ["@b/2\nCC"]


def test_jnp_twin_matches_numpy(rng):
    """paired_final_labels_jnp (the on-device reconciliation the native
    runtime jits, pipeline.py emit="pair_labels") agrees with the numpy
    truth table on random logits for every ensure mode."""
    import jax.numpy as jnp

    from ribodetector_tpu.runtime.ensure import paired_final_labels_jnp

    l1 = rng.standard_normal((256, 2)).astype(np.float32)
    l2 = rng.standard_normal((256, 2)).astype(np.float32)
    for mode in ("rrna", "norrna", "both", "none", None):
        want = paired_final_labels(l1, l2, mode)
        got = np.asarray(paired_final_labels_jnp(jnp.asarray(l1), jnp.asarray(l2), mode))
        np.testing.assert_array_equal(got, want)
