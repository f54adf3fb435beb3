from m3p_tpu.parallel.mesh import make_mesh, infer_mesh_shape
from m3p_tpu.parallel.sharding import (
    LOGICAL_RULES,
    batch_sharding,
    get_param_pspecs,
    shard_train_state,
)
