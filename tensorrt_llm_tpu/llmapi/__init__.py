from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams, GuidedDecodingParams  # noqa: F401
from tensorrt_llm_tpu.llmapi.llm import LLM, RequestOutput  # noqa: F401
from tensorrt_llm_tpu.llmapi.llm_args import LlmArgs  # noqa: F401
