"""tensorrt_llm_tpu — a TPU-native LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of TensorRT-LLM
(reference surveyed in SURVEY.md): LLM API, OpenAI-compatible serving,
continuous batching with paged block-reusable KV cache, weight-only W4A16
quantized GEMMs as Pallas MXU kernels, and TP/PP/EP/DP parallelism expressed
via jax.sharding meshes over ICI.

Nothing here is a port: the compute path is Pallas + XLA, the orchestration is
single-controller JAX.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level exports so `import tensorrt_llm_tpu` stays light.
    if name in ("LLM", "SamplingParams"):
        import tensorrt_llm_tpu.llmapi as llmapi
        return getattr(llmapi, name)
    raise AttributeError(name)
