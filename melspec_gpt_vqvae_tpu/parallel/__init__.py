from .mesh import (  # noqa: F401
    make_mesh,
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
