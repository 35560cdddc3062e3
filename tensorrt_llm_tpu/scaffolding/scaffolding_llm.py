"""ScaffoldingLlm: runs Controllers against an LLM.

Counterpart of the reference's `scaffolding/scaffolding_llm.py`: task batches
from the controller are submitted concurrently to the continuous-batching
executor (they share the in-flight batch with ordinary requests).
"""

from __future__ import annotations

from typing import List

from tensorrt_llm_tpu.scaffolding.controller import Controller, GenerationTask


class ScaffoldingLlm:
    def __init__(self, llm, controller: Controller):
        self.llm = llm
        self.controller = controller

    def _submit(self, tasks: List[GenerationTask]):
        futures = [self.llm.generate_async(t.prompt, t.sampling_params)
                   for t in tasks]
        for t, f in zip(tasks, futures):
            out = f.result()
            comp = out.outputs[0]
            t.output_token_ids = comp.token_ids
            t.output_text = comp.text
            if comp.logprobs:
                t.cumulative_logprob = float(
                    sum(next(iter(d.values())) for d in comp.logprobs))
            t.result = out

    def generate(self, prompt, **kwargs):
        return self.controller.run(prompt, self._submit, **kwargs)
