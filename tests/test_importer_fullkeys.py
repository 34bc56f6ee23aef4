"""Synthetic full-key importer tests: every evaluation-backbone importer is
fed a state dict with the REAL checkpoint key set (random values,
production-scale shapes) and the converted tree must match the flax
module's own parameter structure exactly (paths + shapes, via
jax.eval_shape so no full-scale forward runs).

Guards key drift between the importers and the production checkpoints that
cannot be fetched in this environment (zero egress) — the real-checkpoint
parity gate stays staged in tools/fetch_checkpoints.sh +
tests/test_eval_integration.py. Real key inventories:
  * Cnn14_16k_mAP=0.438.pth — reference
    audioldm_eval/feature_extractors/panns/models.py:168-253
  * torchvggish — reference audioldm_eval/metrics/fad.py:53
  * music_audioset_epoch_15_esc_90.14.pt — reference laion_clap
    clap_module/model.py:420-737 (HTSAT-base + RoBERTa)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tree_spec(tree):
    """{path: shape} over a (possibly eval_shape'd) params tree."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            out["/".join(path)] = tuple(node.shape)

    walk(tree, ())
    return out


def _assert_same_spec(converted, init_params, allow_missing=()):
    got = _tree_spec(converted)
    want = _tree_spec(init_params)
    missing = set(want) - set(got) - set(allow_missing)
    extra = set(got) - set(want)
    assert not missing, f"importer missing params: {sorted(missing)[:10]}"
    assert not extra, f"importer produced unknown params: {sorted(extra)[:10]}"
    for k in got:
        if k in want:
            assert got[k] == want[k], f"{k}: {got[k]} != {want[k]}"


def _t(rs, *shape):
    return rs.standard_normal(shape).astype(np.float32)


def make_cnn14_state_dict(rs=None):
    """Synthetic Cnn14_16k state dict with the REAL checkpoint key set
    (reference audioldm_eval/feature_extractors/panns/models.py:168-253).
    Shared with the corruption tests (test_importer_corruption.py)."""
    rs = rs or np.random.RandomState(0)
    sd = {}
    # non-parameter extractor buffers present in the real ckpt (ignored
    # by the importer: the mel frontend is reimplemented in ops/)
    sd["spectrogram_extractor.stft.conv_real.weight"] = _t(rs, 257, 1, 512)
    sd["spectrogram_extractor.stft.conv_imag.weight"] = _t(rs, 257, 1, 512)
    sd["logmel_extractor.melW"] = _t(rs, 257, 64)

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = _t(rs, n)
        sd[f"{prefix}.bias"] = _t(rs, n)
        sd[f"{prefix}.running_mean"] = _t(rs, n)
        sd[f"{prefix}.running_var"] = np.abs(_t(rs, n)) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.array(0)

    bn("bn0", 64)
    chans = [1, 64, 128, 256, 512, 1024, 2048]
    for i in range(1, 7):
        c_in, c_out = chans[i - 1], chans[i]
        sd[f"conv_block{i}.conv1.weight"] = _t(rs, c_out, c_in, 3, 3)
        bn(f"conv_block{i}.bn1", c_out)
        sd[f"conv_block{i}.conv2.weight"] = _t(rs, c_out, c_out, 3, 3)
        bn(f"conv_block{i}.bn2", c_out)
    sd["fc1.weight"] = _t(rs, 2048, 2048)
    sd["fc1.bias"] = _t(rs, 2048)
    sd["fc_audioset.weight"] = _t(rs, 527, 2048)
    sd["fc_audioset.bias"] = _t(rs, 527)
    return sd


def make_vggish_state_dict(rs=None):
    """Synthetic torchvggish state dict with the real key set (reference
    audioldm_eval/metrics/fad.py:53)."""
    rs = rs or np.random.RandomState(1)
    sd = {}
    conv_dims = {
        "features.0": (64, 1), "features.3": (128, 64),
        "features.6": (256, 128), "features.8": (256, 256),
        "features.11": (512, 256), "features.13": (512, 512),
    }
    for key, (o, i) in conv_dims.items():
        sd[f"{key}.weight"] = _t(rs, o, i, 3, 3)
        sd[f"{key}.bias"] = _t(rs, o)
    fc_dims = {
        "embeddings.0": (4096, 512 * 4 * 6),
        "embeddings.2": (4096, 4096),
        "embeddings.4": (128, 4096),
    }
    for key, (o, i) in fc_dims.items():
        sd[f"{key}.weight"] = _t(rs, o, i)
        sd[f"{key}.bias"] = _t(rs, o)
    return sd


class TestCnn14FullKeys:
    def test_full_checkpoint_keys_convert(self):
        from consistencytta_tpu.evaluation.panns import (
            Cnn14,
            Cnn14Config,
            convert_cnn14,
        )

        sd = make_cnn14_state_dict()
        params = convert_cnn14(sd)
        model = Cnn14(Cnn14Config())
        init = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 16000))
        )["params"]
        _assert_same_spec(params, init)


class TestVGGishFullKeys:
    def test_full_checkpoint_keys_convert(self):
        from consistencytta_tpu.evaluation.vggish import VGGish, convert_vggish

        sd = make_vggish_state_dict()
        params = convert_vggish(sd)
        init = jax.eval_shape(
            VGGish().init, jax.random.PRNGKey(0), jnp.zeros((1, 96, 64))
        )["params"]
        _assert_same_spec(params, init)


@pytest.mark.slow
class TestCLAPFullKeys:
    def test_htsat_base_roberta_keys_convert(self):
        """Production HTSAT-base + RoBERTa dims through the real laion_clap
        key format (tools/make_tiny_clap.make_clap_state_dict generalizes
        the tiny test checkpoint to full scale)."""
        from consistencytta_tpu.evaluation.clap_model import (
            CLAPAudioTower,
            CLAPTextTower,
            convert_clap_audio,
            convert_clap_text,
            infer_clap_configs,
        )
        from tests.conftest import load_repo_tool

        make_clap_state_dict = load_repo_tool("make_tiny_clap").make_clap_state_dict

        sd = make_clap_state_dict(
            embed=128, depths=(2, 2, 12, 2), heads=(4, 8, 16, 32),
            window=8, mlp_ratio=4.0, hidden=768, num_layers=12,
            inter=3072, vocab=50265, max_pos=514, joint=512,
        )
        acfg, tcfg = infer_clap_configs(sd)
        # inference recovers the production config exactly
        assert acfg.embed_dim == 128 and acfg.depths == (2, 2, 12, 2)
        assert acfg.num_heads == (4, 8, 16, 32) and acfg.mlp_ratio == 4.0
        assert tcfg.hidden_size == 768 and tcfg.num_layers == 12
        assert tcfg.vocab_size == 50265 and tcfg.joint_embed == 512

        audio = convert_clap_audio(sd, acfg)
        text = convert_clap_text(sd, tcfg)

        a_init = jax.eval_shape(
            CLAPAudioTower(acfg).init, jax.random.PRNGKey(0),
            jnp.zeros((1, 1001, 64)),
        )["params"]
        t_init = jax.eval_shape(
            CLAPTextTower(tcfg).init, jax.random.PRNGKey(0),
            jnp.zeros((1, 77), jnp.int32), jnp.zeros((1, 77), jnp.int32),
        )["params"]
        _assert_same_spec(audio, a_init)
        _assert_same_spec(text, t_init)
