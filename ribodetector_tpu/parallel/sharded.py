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


_LIMB = 1 << 31  # counts ride the collective as two int31 limbs per value


def counts_to_limbs(counts: dict, keys) -> np.ndarray:
    """[nkeys, 2] int32 (lo, hi) limbs of each int64 count.

    JAX without ``jax_enable_x64`` silently downcasts int64 arrays to int32,
    so shipping raw counts over a collective truncates past 2**31 reads --
    exactly the scale multi-host mode exists for. Each limb is < 2**31 and
    therefore exact in int32 for any count below 2**62.
    """
    arr = np.asarray([counts[k] for k in keys], dtype=np.int64)
    if (arr < 0).any():
        raise ValueError("summary counts must be non-negative")
    return np.stack([arr % _LIMB, arr // _LIMB], axis=1).astype(np.int32)


def limbs_to_counts(gathered: np.ndarray, keys) -> dict:
    """Inverse of counts_to_limbs over a [hosts, nkeys, 2] gather: sum the
    per-host limbs in int64 on the host, then recombine."""
    tot = np.asarray(gathered, dtype=np.int64).sum(axis=0)
    vals = tot[..., 0] + tot[..., 1] * _LIMB
    return {k: int(v) for k, v in zip(keys, vals)}


def merge_counts(local_counts: dict) -> dict:
    """Sum per-host summary counters over all hosts (DCN collective).

    Single-host (the common case) returns the input unchanged. Values are
    split into int31 limbs for the gather and recombined in numpy int64, so
    aggregate counts stay exact past 2**31 reads without enabling x64.
    """
    if jax.process_count() == 1:
        return dict(local_counts)
    from jax.experimental import multihost_utils

    keys = sorted(local_counts)
    limbs = jnp.asarray(counts_to_limbs(local_counts, keys))
    gathered = multihost_utils.process_allgather(limbs)
    return limbs_to_counts(np.asarray(gathered), keys)
