"""Device mesh + sharding policy (SPMD foundation).

The reference has no distribution at all (SURVEY.md §2 rows 19-20: the only
device interaction is six bare ``.cuda()`` calls, e.g.
/root/reference/scripts/train_av_model.py:67). Here the mesh is built FIRST
and every other layer is mesh-aware from day one, even at mesh size 1.
"""

from avsum_tpu.parallel.pipeline import pipeline_apply, stack_stage_params
from avsum_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    AXIS_SEQ,
    MeshConfig,
    batch_spec,
    build_mesh,
    host_cpu_mesh,
    replicated,
    seq_sharded_spec,
    shard_batch,
    shard_replicated,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_SEQ",
    "AXIS_MODEL",
    "MeshConfig",
    "build_mesh",
    "host_cpu_mesh",
    "batch_spec",
    "seq_sharded_spec",
    "replicated",
    "shard_batch",
    "shard_replicated",
    "pipeline_apply",
    "stack_stage_params",
]
