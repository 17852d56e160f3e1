"""Data-parallel trainer for the BiLSTM read classifier.

The reference ships only vestigial training-template code (SURVEY.md C15:
loss/metric stubs and a train/val split sampler; train.py itself is not in
the repo). This module supplies a working TPU-native trainer so the model
can be retrained or fine-tuned: optax optimizer, jitted train/eval steps
shardable over a (dp, tp) mesh, and a synthetic motif dataset for tests and
dry runs. Checkpoint metadata mirrors the reference's (.pth keys
arch/epoch/batch_size/metrics, inspected in SURVEY.md 6).
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ribodetector_tpu.models.bilstm import BiLSTMParams, bilstm_logits, init_params
from ribodetector_tpu.train.loss import cross_entropy_loss
from ribodetector_tpu.train.metrics import confusion_counts


@dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    semantics: str = "dense"
    compute_dtype: str = "float32"


def make_optimizer(cfg: TrainConfig):
    if cfg.weight_decay:
        return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.learning_rate)


def param_shardings(mesh: Mesh) -> BiLSTMParams:
    """Tensor-parallel layout over the "tp" axis: the 512-wide gate dimension
    is sharded, so each tp shard owns 512/tp gates (and the matching hidden
    slice); everything else replicates. With tp=1 this is pure replication."""
    if "tp" in mesh.axis_names:
        gate = NamedSharding(mesh, P(None, "tp"))
        vec = NamedSharding(mesh, P("tp"))
    else:
        gate = NamedSharding(mesh, P())
        vec = NamedSharding(mesh, P())
    rep = NamedSharding(mesh, P())
    return BiLSTMParams(
        w_ih_f=gate, w_hh_f=gate, b_f=vec,
        w_ih_b=gate, w_hh_b=gate, b_b=vec,
        w_out=rep, b_out=rep,
    )


def _loss_fn(params, tokens, lengths, labels, semantics, compute_dtype):
    logits = bilstm_logits(
        params,
        tokens,
        lengths,
        semantics=semantics,
        compute_dtype=compute_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )
    return cross_entropy_loss(logits, labels), logits


def make_train_step(
    cfg: TrainConfig, optimizer, mesh: Mesh | None = None, params=None
):
    """Jitted (params, opt_state, tokens, lengths, labels) -> updated state.

    With a mesh, the batch shards over "dp" and params follow
    param_shardings (tp tensor parallelism); XLA inserts the psum for the
    gradient all-reduce and the tp collectives automatically. Pass the
    REAL params when training a custom width so the optimizer-state
    sharding table matches their shapes (a 128-width default would
    silently replicate every mu/nu leaf for other widths).
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype).type

    def step(params, opt_state, tokens, lengths, labels):
        (loss, logits), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            params, tokens, lengths, labels, cfg.semantics, compute_dtype
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    ps = param_shardings(mesh)
    batch_axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
    data = NamedSharding(mesh, P(batch_axis))
    data2 = NamedSharding(mesh, P(batch_axis, None))
    # opt state mirrors param shapes; share param shardings where shaped alike
    opt_sh = _opt_shardings(optimizer, ps, mesh, params=params)
    return jax.jit(
        step,
        in_shardings=(ps, opt_sh, data2, data, data),
        out_shardings=(ps, opt_sh, NamedSharding(mesh, P())),
        donate_argnums=(0, 1),
    )


def _opt_shardings(optimizer, param_sh, mesh, params=None):
    """Optimizer-state shardings: param-shaped leaves inherit the param
    sharding, scalars replicate. The shape table comes from the given
    params (falling back to the reference 128-width init) so custom-width
    models keep their tensor-parallel optimizer-state layout."""
    if params is None:
        params = init_params(jax.random.PRNGKey(0))
    state = jax.eval_shape(optimizer.init, params)
    flat_ps, _ = jax.tree_util.tree_flatten(param_sh)
    flat_p, _ = jax.tree_util.tree_flatten(params)
    shape_to_sh = {}
    for p, sh in zip(flat_p, flat_ps):
        shape_to_sh.setdefault(p.shape, sh)

    def pick(leaf):
        if hasattr(leaf, "shape") and leaf.shape in shape_to_sh and leaf.ndim > 0:
            return shape_to_sh[leaf.shape]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(pick, state)


def make_eval_step(cfg: TrainConfig):
    """Jitted per-batch eval core: (per-example losses, predictions).

    Kept per-example so evaluation can run in FIXED-SIZE mini-batches (one
    compile; the tail is padded and sliced) instead of one whole-set jit --
    a reference-scale validation set as a single [600k, 100] batch OOMs
    while training itself is bounded by batch_size."""
    compute_dtype = jnp.dtype(cfg.compute_dtype).type

    @jax.jit
    def step(params, tokens, lengths, labels):
        logits = bilstm_logits(
            params,
            tokens,
            lengths,
            semantics=cfg.semantics,
            compute_dtype=compute_dtype,
            precision=jax.lax.Precision.DEFAULT,
        )
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        )
        return losses, logits.argmax(-1)

    return step


def evaluate(eval_step, params, eval_data, batch_size=4096):
    """Mini-batched evaluation: metrics over the WHOLE set (the confusion
    counts come from concatenated predictions, so F1/MCC are exact, not
    batch-averaged)."""
    tokens, lengths, labels = (np.asarray(x) for x in eval_data)
    n = len(labels)
    if n == 0 or batch_size < 1:
        # fail up front with the contract, not "range() arg 3 must not be
        # zero" after a full epoch of training (empty --val-* inputs)
        raise ValueError(
            f"evaluate() needs a non-empty eval set (got {n} rows) and "
            f"batch_size >= 1 (got {batch_size})"
        )
    eb = min(batch_size, n)
    preds = np.empty(n, np.int32)
    loss_sum = 0.0
    for start in range(0, n, eb):
        sl = slice(start, min(start + eb, n))
        t, ln, lb = tokens[sl], lengths[sl], labels[sl]
        pad = eb - len(lb)
        if pad:  # fixed shape: one compile for every batch incl. the tail
            t = np.pad(t, ((0, pad), (0, 0)), constant_values=4)
            ln = np.pad(ln, (0, pad))
            lb = np.pad(lb, (0, pad))
        losses, pred = eval_step(params, t, ln, lb)
        k = sl.stop - sl.start
        preds[sl] = np.asarray(pred)[:k]
        loss_sum += float(jnp.sum(losses[:k]))
    # confusion counts ONCE; the four derived metrics come from the same
    # (tp, fp, tn, fn) instead of re-reducing the full prediction set
    # five times per epoch
    tp, fp, tn, fn = (
        float(x) for x in confusion_counts(jnp.asarray(preds), jnp.asarray(labels))
    )
    eps = 1e-12  # same max(denom, eps) guard as train/metrics.py
    rec = tp / max(tp + fn, eps)
    prec = tp / max(tp + fp, eps)
    denom = ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) ** 0.5
    return {
        "loss": loss_sum / n,
        "acc": (tp + tn) / n,
        "recall": rec,
        "precision": prec,
        "F1": 2 * prec * rec / max(prec + rec, eps),
        "mcc": (tp * tn - fp * fn) / max(denom, eps),
    }


def synthetic_dataset(rng, n, max_len=100, motif="GGAACCTTGGAACC"):
    """Labeled toy reads: label 1 iff the motif was planted. Lets tests prove
    the trainer actually learns (reference offers no training data)."""
    from ribodetector_tpu.encode import encode_batch

    motif = motif[: max(1, max_len // 2)]
    # lmin must leave room to place the motif (rng.integers needs high > low)
    lmin = min(max(len(motif) + 2, max_len // 2), max_len)
    lmin = max(lmin, min(len(motif) + 1, max_len))
    seqs, labels = [], []
    bases = np.array(list("ACGT"))
    for i in range(n):
        L = int(rng.integers(lmin, max_len + 1))
        s = "".join(rng.choice(bases, size=L))
        y = int(rng.integers(0, 2))
        if y:
            pos = int(rng.integers(0, max(1, L - len(motif))))
            s = s[:pos] + motif + s[pos + len(motif):]
        seqs.append(s)
        labels.append(y)
    tokens, lengths = encode_batch(seqs, max_len)
    return tokens, lengths, np.asarray(labels, np.int32)


def fit(
    params: BiLSTMParams,
    data,
    cfg: TrainConfig | None = None,
    *,
    epochs=1,
    batch_size=128,
    mesh: Mesh | None = None,
    eval_data=None,
    log_fn=print,
    checkpoint_dir=None,
    monitor="mcc",
):
    """Minimal in-memory training loop. data = (tokens, lengths, labels).

    checkpoint_dir: save a native .npz artifact per epoch (metadata carries
    arch/epoch/batch_size/metrics, mirroring the reference checkpoint's
    embedded keys -- SURVEY.md C7) plus `best.npz` tracking the best
    `monitor` metric on eval_data. Artifacts load with models.load_params
    and export back to torch via models.convert (export_checkpoint).
    """
    import os

    from ribodetector_tpu.models.bilstm import save_params

    cfg = cfg or TrainConfig()
    if int(batch_size) < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    valid_monitors = {"train_loss", "loss", "acc", "recall", "precision",
                      "F1", "mcc"}
    if monitor not in valid_monitors:
        # fail BEFORE an epoch of work (and even without checkpoints the
        # typo should not be silently ignored)
        raise ValueError(f"monitor={monitor!r} not one of {sorted(valid_monitors)}")
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, optimizer, mesh, params=params)
    eval_step = make_eval_step(cfg)

    tokens, lengths, labels = data
    n = len(labels)
    if n == 0:
        raise ValueError("fit() received an empty dataset")
    if batch_size > n:
        # a zero-step epoch would 'train' nothing yet still checkpoint;
        # shrink instead (the last fractional batch is dropped by design,
        # matching the reference's drop_last-style loop)
        log_fn(f"batch_size {batch_size} > dataset size {n}; using {n}")
        batch_size = n
    best = None
    for epoch in range(epochs):
        perm = np.random.default_rng(epoch).permutation(n)
        losses = []
        for start in range(0, n - batch_size + 1, batch_size):
            idx = perm[start : start + batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, tokens[idx], lengths[idx], labels[idx]
            )
            losses.append(float(loss))
        metrics = {"train_loss": float(np.mean(losses))}
        msg = f"epoch {epoch}: loss {metrics['train_loss']:.4f}"
        if eval_data is not None:
            m = evaluate(eval_step, params, eval_data)
            metrics.update(m)
            msg += " " + " ".join(f"{k} {v:.4f}" for k, v in m.items())
        log_fn(msg)
        if checkpoint_dir is not None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            hidden = params.w_hh_f.shape[0]
            meta = {
                "arch": f"BiLSTM 4x{hidden}x2 bidirectional",
                "epoch": epoch,
                "batch_size": batch_size,
                "metrics": metrics,
            }
            save_params(
                os.path.join(checkpoint_dir, f"epoch{epoch:03d}.npz"), params, meta
            )
            if monitor in metrics:
                # loss-like monitors are minimized; everything else maximized
                sign = -1.0 if "loss" in monitor else 1.0
                score = sign * metrics[monitor]
            else:
                if eval_data is not None:
                    raise ValueError(
                        f"monitor={monitor!r} not in metrics {sorted(metrics)}"
                    )
                score = -metrics["train_loss"]
            if best is None or score > best:
                best = score
                save_params(os.path.join(checkpoint_dir, "best.npz"), params, meta)
    return params
