from ribodetector_tpu.parallel.mesh import (
    make_data_mesh,
    make_dp_tp_mesh,
    replicated,
    batch_sharded,
)
from ribodetector_tpu.parallel.sharded import (
    make_sharded_classifier,
    host_chunk_assignment,
    merge_counts,
)

__all__ = [
    "make_data_mesh",
    "make_dp_tp_mesh",
    "replicated",
    "batch_sharded",
    "make_sharded_classifier",
    "host_chunk_assignment",
    "merge_counts",
]
