from .mesh import (  # noqa: F401
    make_mesh,
    parse_mesh,
    maybe_init_distributed,
    batch_sharding,
    replicated,
    put_batch,
    shard_batch,
    gpt_param_pspecs,
    shard_gpt_params,
    local_batch_slice,
    process_index,
    is_primary,
)
from .pipeline import (  # noqa: F401
    PIPE_AXIS,
    gpt_apply_pp,
    gpt_param_pp_pspecs,
    gpt_pp_loss_fn,
    shard_gpt_params_pp,
)
