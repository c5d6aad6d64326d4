from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh,  # noqa: F401
                   pad_to_multiple, replicated, shard_batch)
