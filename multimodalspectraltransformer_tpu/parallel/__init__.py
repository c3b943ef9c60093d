from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_extent,
    make_mesh,
    make_multislice_mesh,
    param_shardings,
    replicated,
    shard_for_inference,
)
