"""Multi-chip execution: mesh construction + sharded/batched alignment."""

from point_cloud_registration_tpu.parallel.mesh import make_mesh
from point_cloud_registration_tpu.parallel.sharded import (
    STATS_FNS,
    align_batched_sharded,
    align_sharded,
)
