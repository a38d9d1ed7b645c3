"""Multi-chip sharding: mesh construction + sharded pipeline steps."""

from .mesh import (  # noqa: F401
    make_mesh,
    shard_frames,
    replicate,
    sharded_pipeline_step,
    sharded_engine_step,
    sharded_classic_pipeline,
)
from .halo import halo_exchange_rows, spatial_halo_call  # noqa: F401
