"""Mesh/sharding utilities for scale-out Monte-Carlo inference."""

from chirpgp_tpu.parallel.mesh import (
    make_mesh, shard_keys, sharded_seed_sweep, sharded_mean, pad_to_multiple)
from chirpgp_tpu.parallel.multihost import (
    initialize_distributed, global_mesh, process_info)

__all__ = ["make_mesh", "shard_keys", "sharded_seed_sweep", "sharded_mean",
           "pad_to_multiple",
           "initialize_distributed", "global_mesh", "process_info"]
