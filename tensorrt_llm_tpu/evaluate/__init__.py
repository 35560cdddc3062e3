from tensorrt_llm_tpu.evaluate.tasks import get_task, compute_threshold  # noqa: F401
