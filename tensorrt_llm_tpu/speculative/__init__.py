from tensorrt_llm_tpu.speculative.interface import (  # noqa: F401
    SpeculativeConfig,
    SpeculativeMode,
    get_drafter,
    suggest_spec_config,
)
from tensorrt_llm_tpu.speculative.ngram import NGramDrafter  # noqa: F401
from tensorrt_llm_tpu.speculative.draft_target import DraftTargetDrafter  # noqa: F401
