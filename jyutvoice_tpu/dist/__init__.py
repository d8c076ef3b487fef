from jyutvoice_tpu.dist.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from jyutvoice_tpu.dist.gspmd import gspmd_safe_cfm_cfg  # noqa: F401
from jyutvoice_tpu.dist.ring import ring_attention  # noqa: F401
from jyutvoice_tpu.dist.sp import (  # noqa: F401
    make_sp_mesh,
    seq_sharding,
    sp_cfm_solve,
    sp_param_shardings,
)
from jyutvoice_tpu.dist.tp import make_tp_mesh, tp_cfm_cfg  # noqa: F401
