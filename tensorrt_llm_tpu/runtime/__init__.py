from tensorrt_llm_tpu.runtime.request import LlmRequest, RequestState  # noqa: F401
from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager, KVCacheConfig  # noqa: F401
from tensorrt_llm_tpu.runtime.scheduler import (  # noqa: F401
    CapacitySchedulerPolicy,
    Scheduler,
    ScheduledBatch,
)
from tensorrt_llm_tpu.runtime.executor import PyExecutor  # noqa: F401
