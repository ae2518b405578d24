from ..core.sharding import (DATA_AXIS, batch_sharding, init_distributed,  # noqa: F401
                             make_mesh, replicated, shard_batch)
from .tp import (MODEL_AXIS, column_parallel_dense, head_parallel_attention,  # noqa: F401
                 make_2d_mesh, row_parallel_dense)
