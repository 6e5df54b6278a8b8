"""Mesh/sharding utilities for scale-out Monte-Carlo inference."""

from chirpgp_tpu.parallel.mesh import (
    make_mesh, shard_keys, sharded_seed_sweep, sharded_mean, pad_to_multiple)

__all__ = ["make_mesh", "shard_keys", "sharded_seed_sweep", "sharded_mean",
           "pad_to_multiple"]
