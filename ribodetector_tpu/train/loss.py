"""Training losses (counterpart of the reference's model/loss.py:4-9)."""

import jax
import jax.numpy as jnp


def nll_loss(log_probs, labels):
    """Mean negative log likelihood of already-log-softmaxed outputs."""
    return -jnp.take_along_axis(log_probs, labels[:, None], axis=1).mean()


def cross_entropy_loss(logits, labels):
    """Mean softmax cross entropy from raw logits (torch F.cross_entropy)."""
    return nll_loss(jax.nn.log_softmax(logits, axis=-1), labels)
