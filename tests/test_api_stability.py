"""API stability: pin the public surface.

Counterpart of the reference's API snapshot tests
(`tests/unittest/api_stability/` — YAML signature references): changes to the
public API must be deliberate (update the EXPECTED dicts in the same commit).
"""

import inspect

import tensorrt_llm_tpu as tllm
from tensorrt_llm_tpu.llmapi import LLM, LlmArgs, SamplingParams
from tensorrt_llm_tpu.llmapi.llm import RequestOutput, CompletionOutput

EXPECTED_SAMPLING_PARAMS = {
    "max_tokens", "temperature", "top_k", "top_p", "min_p",
    "repetition_penalty", "presence_penalty", "frequency_penalty", "seed",
    "stop", "stop_token_ids", "include_stop_str_in_output", "ignore_eos",
    "logprobs", "prompt_logprobs", "return_context_logits",
    "return_generation_logits", "n", "best_of", "use_beam_search",
    "beam_width_array",
    "detokenize", "skip_special_tokens", "guided_decoding", "end_id",
    "length_penalty",    "min_tokens", "bad_words", "logit_bias",
    "no_repeat_ngram_size", "logits_processor",
}

EXPECTED_LLM_ARGS_SUPERSET = {
    "model", "tokenizer", "dtype", "tensor_parallel_size",
    "pipeline_parallel_size", "data_parallel_size",
    "moe_expert_parallel_size", "quant_algo", "quant_group_size",
    "kv_cache_quant", "max_batch_size", "max_num_tokens", "max_seq_len",
    "kv_cache_config", "kv_block_size", "kv_num_blocks", "free_mem_fraction",
    "enable_block_reuse", "scheduler_policy", "enable_chunked_prefill",
    "attention_backend", "lora_path", "speculative_config",
    "max_decode_steps", "seed", "skip_tokenizer_init",
    "enable_iter_perf_stats", "watchdog_timeout", "profile_start_stop",
    "extra_llm_api_options",
}

EXPECTED_LLM_METHODS = {
    "generate", "generate_async", "score", "get_stats",
    "get_kv_cache_stats", "shutdown", "tokenizer", "update_weights",
}


def test_sampling_params_fields():
    fields = set(SamplingParams.__dataclass_fields__)
    assert fields == EXPECTED_SAMPLING_PARAMS, (
        f"added: {fields - EXPECTED_SAMPLING_PARAMS}, "
        f"removed: {EXPECTED_SAMPLING_PARAMS - fields}")


def test_llm_args_fields():
    fields = set(LlmArgs.__dataclass_fields__)
    missing = EXPECTED_LLM_ARGS_SUPERSET - fields
    assert not missing, f"removed public LlmArgs fields: {missing}"


def test_llm_public_methods():
    members = {n for n, _ in inspect.getmembers(LLM)
               if not n.startswith("_")}
    missing = EXPECTED_LLM_METHODS - members
    assert not missing, missing


def test_top_level_exports():
    assert tllm.LLM is LLM
    assert tllm.SamplingParams is SamplingParams


def test_request_output_shape():
    fields = set(RequestOutput.__dataclass_fields__)
    assert {"request_id", "prompt", "prompt_token_ids", "outputs",
            "finished"} <= fields
    assert {"index", "text", "token_ids", "finish_reason",
            "logprobs"} <= set(CompletionOutput.__dataclass_fields__)


def test_generate_signature():
    sig = inspect.signature(LLM.generate)
    assert list(sig.parameters)[:3] == ["self", "prompts", "sampling_params"]
