"""Device-mesh sharding for the batch axes (controllers / restarts / envs)."""

from code_robchar_tpu.parallel.mesh import (
    make_mesh,
    sharded_mc_metrics,
    sharded_mc_sweep,
    sharded_run_batch,
    shard_batch,
)

__all__ = ["make_mesh", "sharded_mc_metrics", "sharded_mc_sweep",
           "sharded_run_batch", "shard_batch"]
