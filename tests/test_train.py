"""Training subsystem: loss, metrics, and learning on a planted-motif task.

The reference ships only vestigial training stubs (SURVEY.md C15) -- and its
F1()/mcc() are buggy (metric.py:77-82 index the wrong tuple slots); the
metric tests below pin the corrected formulas against hand-computed values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ribodetector_tpu.models.bilstm import init_params
from ribodetector_tpu.train import (
    TrainConfig,
    accuracy,
    confusion_counts,
    cross_entropy_loss,
    f1,
    fit,
    mcc,
    precision,
    recall,
    synthetic_dataset,
)


def test_cross_entropy_matches_hand():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
    labels = jnp.asarray([0, 0])
    p0 = np.exp(2) / (np.exp(2) + 1)
    p1 = 1 / (1 + np.exp(3))
    want = -(np.log(p0) + np.log(p1)) / 2
    assert abs(float(cross_entropy_loss(logits, labels)) - want) < 1e-6


def test_metrics_hand_computed():
    #            tp          fp          tn          fn
    pred = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
    true = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0, 1, 1])
    tp, fp, tn, fn = map(int, confusion_counts(pred, true))
    assert (tp, fp, tn, fn) == (3, 1, 4, 2)
    assert abs(float(accuracy(pred, true)) - 0.7) < 1e-6
    assert abs(float(recall(pred, true)) - 3 / 5) < 1e-6
    assert abs(float(precision(pred, true)) - 3 / 4) < 1e-6
    p, r = 3 / 4, 3 / 5
    assert abs(float(f1(pred, true)) - 2 * p * r / (p + r)) < 1e-6
    want_mcc = (3 * 4 - 1 * 2) / np.sqrt((3 + 1) * (3 + 2) * (4 + 1) * (4 + 2))
    assert abs(float(mcc(pred, true)) - want_mcc) < 1e-5


def test_trainer_learns_planted_motif():
    # dedicated rng: the session fixture's state depends on test order and
    # this test's pass/fail must not
    rng = np.random.default_rng(7)
    max_len = 32
    tokens, lengths, labels = synthetic_dataset(rng, 512, max_len=max_len)
    params = init_params(jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-2, semantics="dense")
    logs = []
    params = fit(
        params,
        (tokens, lengths, labels),
        cfg,
        epochs=6,
        batch_size=64,
        eval_data=(tokens, lengths, labels),
        log_fn=logs.append,
    )
    from ribodetector_tpu.train.trainer import make_eval_step

    metrics = make_eval_step(cfg)(
        params, jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(labels)
    )
    # the motif task is easy: training must beat chance clearly
    assert float(metrics["acc"]) > 0.8, logs


def test_checkpoint_metrics_recorded(ref_params_path):
    # converted artifact preserves the reference checkpoint's val metrics
    from ribodetector_tpu.models.bilstm import load_params_meta

    meta = load_params_meta(ref_params_path)
    assert meta["metrics"]["val_acc"] == pytest.approx(0.99300, abs=1e-4)
    assert meta["epoch"] == 47
