from tensorrt_llm_tpu.utils.common import (  # noqa: F401
    cdiv,
    round_up,
    pad_to,
    pad_dim,
    largest_divisor_leq,
    is_tpu_backend,
    logger,
)
