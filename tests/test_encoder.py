"""BERT-class encoder: HF parity + embeddings/reranking surface."""

import numpy as np
import pytest

import tensorrt_llm_tpu as tllm
from tensorrt_llm_tpu.models.modeling_utils import ModelConfig


def mk_hf(num_labels=3):
    torch = pytest.importorskip("torch")
    import transformers
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, num_labels=num_labels,
        pad_token_id=0)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    return hf_cfg, hf, sd


def test_bert_classifier_matches_hf():
    torch = pytest.importorskip("torch")
    hf_cfg, hf, sd = mk_hf()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "BertForSequenceClassification"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   seed=0)
    try:
        llm.encoder.params = llm.model.load_hf_weights(lambda n: sd.get(n))
        batch = [[2, 5, 9, 11], [3, 7, 2, 9, 14, 1]]
        ours = llm.score_pairs(batch)
        import torch as T
        maxlen = max(len(b) for b in batch)
        ids = T.zeros((2, maxlen), dtype=T.long)
        mask = T.zeros((2, maxlen), dtype=T.long)
        for i, b in enumerate(batch):
            ids[i, :len(b)] = T.tensor(b)
            mask[i, :len(b)] = 1
        with torch.no_grad():
            want = hf(input_ids=ids, attention_mask=mask).logits.numpy()
        assert np.argmax(ours, -1).tolist() == np.argmax(want, -1).tolist()
        np.testing.assert_allclose(ours, want, rtol=5e-2, atol=5e-2)
    finally:
        llm.shutdown()


def test_bert_embeddings_and_endpoint():
    pytest.importorskip("torch")
    hf_cfg, hf, sd = mk_hf()
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg.architecture = "BertModel"
    llm = tllm.LLM(model=cfg, skip_tokenizer_init=True, max_seq_len=64,
                   seed=0)
    try:
        llm.encoder.params = llm.model.load_hf_weights(lambda n: sd.get(n))
        vecs = llm.embed([[2, 5, 9], [3, 7]], pooling="mean")
        assert vecs.shape == (2, 64)
        assert np.isfinite(vecs).all()

        # /v1/embeddings endpoint
        import asyncio
        from aiohttp.test_utils import TestClient, TestServer
        from tensorrt_llm_tpu.serve.openai_server import OpenAIServer
        loop = asyncio.new_event_loop()
        tc = TestClient(TestServer(OpenAIServer(llm, "bert").app,
                                   loop=loop), loop=loop)
        loop.run_until_complete(tc.start_server())

        async def drive():
            r = await tc.post("/v1/embeddings",
                              json={"input": [[2, 5, 9]], "pooling": "cls"})
            assert r.status == 200, await r.text()
            out = await r.json()
            assert len(out["data"]) == 1
            assert len(out["data"][0]["embedding"]) == 64
        loop.run_until_complete(drive())
        loop.run_until_complete(tc.close())
        loop.close()
    finally:
        llm.shutdown()
