from .gpt import (  # noqa: F401
    init_gpt_params,
    gpt_apply,
    class_embed,
    cross_entropy_loss,
    init_kv_cache,
    gpt_prefill,
    gpt_decode_step,
    gpt_generate,
    count_params,
)
