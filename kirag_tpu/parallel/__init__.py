from kirag_tpu.parallel.mesh import (
    MeshAxes,
    create_mesh,
    distributed_init,
    replicated,
    shard_spec,
    sharded,
)

__all__ = [
    "MeshAxes",
    "create_mesh",
    "distributed_init",
    "replicated",
    "shard_spec",
    "sharded",
]
