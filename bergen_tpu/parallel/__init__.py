from bergen_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    device_count,
    shard_batch,
    replicate,
)
