"""SPMD parallelism over TPU meshes (the reference's DDP/NCCL layer, redone).

The reference distributes with torch DDP + NCCL process groups
(demonet/util/misc.py:302-324, train.py:163). Here distribution is SPMD:
one mesh, sharding annotations, XLA collectives over ICI
(SURVEY.md §2c).
"""

from demonet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicate,
    shard_batch,
)
from demonet_tpu.parallel.dist import (  # noqa: F401
    initialize,
    is_main_process,
    process_count,
    process_index,
    sync_devices,
)
