from tensorrt_llm_tpu.serve.openai_server import OpenAIServer  # noqa: F401
