from tensorrt_llm_tpu.llmapi.sampling_params import SamplingParams, GuidedDecodingParams  # noqa: F401

_LAZY = {"LLM": "llm", "RequestOutput": "llm", "LlmArgs": "llm_args",
         "MultimodalEncoder": "llm"}


def __getattr__(name):
    # LLM pulls in the whole runtime — keep it lazy so runtime modules can
    # import llmapi.sampling_params without a cycle.
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f"tensorrt_llm_tpu.llmapi.{_LAZY[name]}")
        return getattr(mod, name)
    raise AttributeError(name)
