from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,  # noqa: F401
                   pad_to_multiple, replicated, shard_batch)
from .multihost import (global_batch, global_mesh,  # noqa: F401
                        init_distributed, process_count, process_index,
                        replicate_tree)
