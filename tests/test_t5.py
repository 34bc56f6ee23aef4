"""T5 encoder parity against HF transformers (torch, random init)."""

import numpy as np
import pytest

from consistencytta_tpu.configs import T5Config
from consistencytta_tpu.io.torch_import import convert_t5
from consistencytta_tpu.nn.t5 import T5Encoder


def tiny_config():
    return T5Config(
        vocab_size=256,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=3,
        num_heads=4,
    )


class TestT5Parity:
    def test_encoder_matches_hf(self, rng):
        import torch
        from transformers import T5Config as HFT5Config
        from transformers import T5EncoderModel

        cfg = tiny_config()
        hf_cfg = HFT5Config(
            vocab_size=cfg.vocab_size,
            d_model=cfg.d_model,
            d_kv=cfg.d_kv,
            d_ff=cfg.d_ff,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            relative_attention_num_buckets=cfg.relative_attention_num_buckets,
            relative_attention_max_distance=cfg.relative_attention_max_distance,
            feed_forward_proj="gated-gelu",
            is_encoder_decoder=False,
            use_cache=False,
        )
        torch.manual_seed(0)
        hf = T5EncoderModel(hf_cfg)
        hf.eval()

        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = convert_t5(sd, cfg.num_layers)
        model = T5Encoder(cfg)

        ids = rng.integers(0, cfg.vocab_size, size=(2, 11)).astype(np.int32)
        mask = np.ones((2, 11), np.int32)
        mask[0, 7:] = 0

        with torch.no_grad():
            want = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).last_hidden_state.numpy()

        got = np.asarray(model.apply({"params": params}, ids, mask))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_flan_t5_large_geometry(self):
        cfg = T5Config()
        assert cfg.d_model == 1024 and cfg.num_layers == 24
        assert cfg.feed_forward_proj == "gated-gelu"
