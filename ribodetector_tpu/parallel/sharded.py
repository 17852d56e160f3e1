"""Sharded inference step + multi-host streaming coordination.

Design (SURVEY.md 5 "Distributed communication backend"): weights replicated
(tiny), batches sharded over a 1-D data mesh via ICI; hosts each parse their
own round-robin slice of the input chunk stream (DCN only coordinates chunk
assignment implicitly through deterministic numbering), and summary counters
are merged with a psum at the end. Outputs are written per host and
concatenated in deterministic shard order, preserving the reference GPU
path's input-order semantics (detect.py writes in input order; the reference
CPU path is completion-order nondeterministic and is NOT reproduced).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ribodetector_tpu.ops import classify_logits
from ribodetector_tpu.parallel.mesh import replicated


def make_sharded_classifier(
    params,
    mesh,
    *,
    semantics="dense",
    compute_dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    kernel="scan",
):
    """Jitted (tokens [B,T], lengths [B]) -> logits [B,2], batch-sharded.

    B must be divisible by the mesh's data-axis size; the runtime pads
    batches to a power-of-two batch size which satisfies this for any
    power-of-two mesh.
    """
    params = jax.device_put(params, replicated(mesh))

    def infer(tokens, lengths):
        return classify_logits(
            params,
            tokens,
            lengths,
            semantics=semantics,
            compute_dtype=compute_dtype,
            precision=precision,
            kernel=kernel,
        )

    return jax.jit(
        infer,
        in_shardings=(
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data")),
        ),
        out_shardings=NamedSharding(mesh, P("data", None)),
    )


def host_chunk_assignment(chunk_index: int, num_hosts: int, host_id: int) -> bool:
    """Round-robin chunk ownership: host h processes chunks with
    chunk_index % num_hosts == host_id. Deterministic, no coordination
    traffic; output files are merged in chunk order."""
    return chunk_index % num_hosts == host_id


def merge_counts(local_counts: dict) -> dict:
    """psum per-host summary counters over all hosts (DCN collective).

    Single-host (the common case) returns the input unchanged.
    """
    if jax.process_count() == 1:
        return dict(local_counts)
    from jax.experimental import multihost_utils

    keys = sorted(local_counts)
    vec = jnp.asarray([local_counts[k] for k in keys], jnp.int64)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: int(v) for k, v in zip(keys, np.asarray(summed))}
