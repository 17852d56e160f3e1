"""Classification metrics.

Counterpart of the reference's model/metric.py:5-82 with the same metric set
(accuracy / recall / precision / F1 / MCC, positive class = label 1 = rRNA).
NOTE: the reference's F1() and mcc() return the wrong tuple indices
(metric.py:77-82 index pr[2]/pr[3] of a 3-tuple slice); these are the
corrected formulas -- validated against the checkpoint's recorded val
metrics in tests/test_train.py.
"""

import jax.numpy as jnp


def confusion_counts(pred_labels, labels):
    """(tp, fp, tn, fn) with positive class = 1."""
    pos = labels == 1
    pred_pos = pred_labels == 1
    tp = jnp.sum(pos & pred_pos)
    fp = jnp.sum(~pos & pred_pos)
    tn = jnp.sum(~pos & ~pred_pos)
    fn = jnp.sum(pos & ~pred_pos)
    return tp, fp, tn, fn


def accuracy(pred_labels, labels):
    return jnp.mean(pred_labels == labels)


def recall(pred_labels, labels, eps=1e-12):
    tp, fp, tn, fn = confusion_counts(pred_labels, labels)
    return tp / jnp.maximum(tp + fn, eps)


def precision(pred_labels, labels, eps=1e-12):
    tp, fp, tn, fn = confusion_counts(pred_labels, labels)
    return tp / jnp.maximum(tp + fp, eps)


def f1(pred_labels, labels, eps=1e-12):
    p = precision(pred_labels, labels)
    r = recall(pred_labels, labels)
    return 2 * p * r / jnp.maximum(p + r, eps)


def mcc(pred_labels, labels, eps=1e-12):
    tp, fp, tn, fn = (x.astype(jnp.float32) for x in confusion_counts(pred_labels, labels))
    num = tp * tn - fp * fn
    den = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return num / jnp.maximum(den, eps)
