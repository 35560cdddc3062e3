from tensorrt_llm_tpu.models.modeling_utils import (  # noqa: F401
    ModelConfig,
    DecoderModelForCausalLM,
    register_auto_model,
    get_model_class,
)
import tensorrt_llm_tpu.models.lfm2  # noqa: F401
import tensorrt_llm_tpu.models.llama  # noqa: F401  (registers architectures)
import tensorrt_llm_tpu.models.mixtral  # noqa: F401
import tensorrt_llm_tpu.models.gemma  # noqa: F401
import tensorrt_llm_tpu.models.phi  # noqa: F401
import tensorrt_llm_tpu.models.deepseek  # noqa: F401
import tensorrt_llm_tpu.models.gpt_oss  # noqa: F401
import tensorrt_llm_tpu.models.mamba2  # noqa: F401
import tensorrt_llm_tpu.models.llava  # noqa: F401
import tensorrt_llm_tpu.models.exaone_moe  # noqa: F401
import tensorrt_llm_tpu.models.minimax_m2  # noqa: F401
import tensorrt_llm_tpu.models.mistral_large3  # noqa: F401
import tensorrt_llm_tpu.models.nemotron_nano_vl  # noqa: F401
import tensorrt_llm_tpu.models.nemotron_nas  # noqa: F401
import tensorrt_llm_tpu.models.nemotron_h  # noqa: F401
import tensorrt_llm_tpu.models.llama4  # noqa: F401
import tensorrt_llm_tpu.models.starcoder2  # noqa: F401
import tensorrt_llm_tpu.models.nemotron  # noqa: F401
import tensorrt_llm_tpu.models.glm  # noqa: F401
import tensorrt_llm_tpu.models.seed_oss  # noqa: F401
import tensorrt_llm_tpu.models.smollm3  # noqa: F401
import tensorrt_llm_tpu.models.granite  # noqa: F401
import tensorrt_llm_tpu.models.olmo2  # noqa: F401
import tensorrt_llm_tpu.models.exaone4  # noqa: F401
import tensorrt_llm_tpu.models.glm4_moe  # noqa: F401
import tensorrt_llm_tpu.models.dots1  # noqa: F401
import tensorrt_llm_tpu.models.hunyuan  # noqa: F401
import tensorrt_llm_tpu.models.apertus  # noqa: F401
import tensorrt_llm_tpu.models.bamba  # noqa: F401
import tensorrt_llm_tpu.models.phi4mm  # noqa: F401
import tensorrt_llm_tpu.models.qwen2_vl  # noqa: F401
import tensorrt_llm_tpu.models.minimax  # noqa: F401
import tensorrt_llm_tpu.models.mllama  # noqa: F401
import tensorrt_llm_tpu.models.qwen3_next  # noqa: F401
import tensorrt_llm_tpu.models.qwen3_vl  # noqa: F401
import tensorrt_llm_tpu.models.vila  # noqa: F401
import tensorrt_llm_tpu.models.hyperclovax  # noqa: F401
import tensorrt_llm_tpu.models.bert  # noqa: F401
