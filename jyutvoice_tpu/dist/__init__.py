from jyutvoice_tpu.dist.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from jyutvoice_tpu.dist.sp import (  # noqa: F401
    make_sp_mesh,
    seq_sharding,
    sp_cfm_solve,
    sp_param_shardings,
)
