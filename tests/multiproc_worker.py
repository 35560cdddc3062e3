"""Worker entry for the multi-process (multi-host-shaped) CPU tests.

Each OS process joins one jax.distributed world (the reference's MPI world
bootstrap, `llmapi/mpi_session.py` + rank-0 ingestion/broadcast in
`executor/executor_request_queue.py:346-426`), builds an LLM whose TP mesh
spans both processes, and runs the collective executor loop.  Rank 0 submits
requests and writes greedy outputs to a JSON file; other ranks idle in the
ingest collective until rank 0 broadcasts shutdown.

Run: python multiproc_worker.py <rank> <size> <port> <out_path>
"""

import json
import os
import sys

LOCAL_DEVICES = 2

TINY = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
            max_position=256)

PROMPTS = [[3, 4, 5], [17, 3, 99, 100, 5], [1, 2], [7, 7, 7, 7]]


def main(rank: int, size: int, port: int, out_path: str,
         mode: str = "tp"):
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tensorrt_llm_tpu.llmapi import LLM, SamplingParams

    from tensorrt_llm_tpu.models.modeling_utils import ModelConfig

    cfg = ModelConfig(**TINY)
    if mode == "tp":
        par = dict(tensor_parallel_size=size * LOCAL_DEVICES)
    elif mode == "dp":
        par = dict(data_parallel_size=size,            # dp spans processes
                   tensor_parallel_size=LOCAL_DEVICES)
    elif mode == "pp":                                 # stages span
        par = dict(pipeline_parallel_size=LOCAL_DEVICES,  # both processes
                   tensor_parallel_size=size)
    else:                                              # "cp": ulysses over
        par = dict(context_parallel_size=size,         # processes
                   tensor_parallel_size=LOCAL_DEVICES)
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=128,
              max_batch_size=8, kv_num_blocks=128, kv_block_size=8,
              distributed_init=dict(
                  coordinator_address=f"127.0.0.1:{port}",
                  num_processes=size, process_id=rank), **par)
    assert jax.process_count() == size
    if rank == 0:
        outs = llm.generate(
            PROMPTS, SamplingParams(max_tokens=8, ignore_eos=True))
        with open(out_path, "w") as f:
            json.dump([o.outputs[0].token_ids for o in outs], f)
        llm.shutdown()
    else:
        # the loop ends when rank 0 broadcasts the collective stop flag
        llm.executor._thread.join()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5] if len(sys.argv) > 5 else "tp")
