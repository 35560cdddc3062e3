from tensorrt_llm_tpu.lora.lora_manager import LoraAdapter, load_lora_adapter, merge_lora_into_state  # noqa: F401
