from aline_tpu.parallel.mesh import (
    get_mesh,
    shard_batch_spec,
    shard_leading_axis,
    replicate,
)
from aline_tpu.parallel.collectives import streaming_logsumexp_combine
