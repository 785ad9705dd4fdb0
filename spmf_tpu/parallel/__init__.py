from .distributed import global_mesh, initialize_distributed, process_local_rows
from .mesh import (
    data_parallel_mesh,
    make_mesh,
    make_multislice_mesh,
    replicate,
    shard_batch,
    shard_params_feature_dim,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "data_parallel_mesh",
    "shard_batch",
    "replicate",
    "shard_params_feature_dim",
    "initialize_distributed",
    "global_mesh",
    "process_local_rows",
]
