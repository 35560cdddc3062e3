from tensorrt_llm_tpu.models.vision.clip import CLIPVisionTower  # noqa: F401
