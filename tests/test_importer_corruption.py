"""Corrupted-checkpoint failure modes: the importers must fail LOUDLY,
naming the offending key, for both corruption classes a real-asset day-1
run can hit — a renamed/missing source key and a wrong-SHAPE tensor.

This is the dry run of the real-checkpoint parity gate asked for by the
round-3 verdict: tests/test_eval_integration.py stays asset-gated, and
these tests prove its failure modes are diagnosable without assets.
A silent mis-map is the failure being guarded against: numpy transposes
any shape, so without import-time validation a wrong tensor would surface
as a cryptic XLA dot-dimension error (or worse, run and skew FAD).
"""

import os

import numpy as np
import pytest

from tests.test_importer_fullkeys import (
    make_cnn14_state_dict,
    make_vggish_state_dict,
)


def _save_torch(sd, path):
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)


# The synthetic checkpoints carry REAL shapes (conv_block6 alone is a
# 2048x1024x3x3 tensor), so generating one costs seconds — build each once
# per module; tests corrupt a SHALLOW dict copy (they only delete/replace
# top-level entries, never mutate arrays in place).
@pytest.fixture(scope="module")
def cnn14_sd():
    return make_cnn14_state_dict()


@pytest.fixture(scope="module")
def vggish_sd():
    return make_vggish_state_dict()


class TestCnn14Corruption:
    def test_missing_key_named(self, cnn14_sd):
        from consistencytta_tpu.evaluation.panns import convert_cnn14

        sd = dict(cnn14_sd)
        del sd["conv_block3.conv1.weight"]
        with pytest.raises(KeyError, match="conv_block3.conv1.weight"):
            convert_cnn14(sd)

    def test_wrong_shape_named_via_helper(self, tmp_path, cnn14_sd):
        """End-to-end through EvaluationHelper's loader: a truncated fc1
        must raise with the parameter path and both shapes, not reach XLA."""
        from consistencytta_tpu.evaluation.harness import EvaluationHelper

        sd = dict(cnn14_sd)
        sd["fc1.weight"] = sd["fc1.weight"][:, :1024]  # 2048x2048 -> 2048x1024
        ckpt = str(tmp_path / "cnn14_bad.pth")
        _save_torch(sd, ckpt)

        helper = EvaluationHelper(
            cnn14_checkpoint=ckpt, vggish_checkpoint=None, clap_checkpoint=None
        )
        with pytest.raises(ValueError, match=r"fc1"):
            helper._get_cnn14()

    def test_renamed_key_named_via_helper(self, tmp_path, cnn14_sd):
        from consistencytta_tpu.evaluation.harness import EvaluationHelper

        sd = dict(cnn14_sd)
        sd["conv_block2.convA.weight"] = sd.pop("conv_block2.conv1.weight")
        ckpt = str(tmp_path / "cnn14_renamed.pth")
        _save_torch(sd, ckpt)

        helper = EvaluationHelper(
            cnn14_checkpoint=ckpt, vggish_checkpoint=None, clap_checkpoint=None
        )
        with pytest.raises(KeyError, match="conv_block2.conv1.weight"):
            helper._get_cnn14()


class TestVGGishCorruption:
    def test_missing_key_named(self, vggish_sd):
        from consistencytta_tpu.evaluation.vggish import convert_vggish

        sd = dict(vggish_sd)
        del sd["embeddings.2.weight"]
        with pytest.raises(KeyError, match="embeddings.2.weight"):
            convert_vggish(sd)

    def test_wrong_shape_named_via_embeddings(self, tmp_path, vggish_sd):
        from consistencytta_tpu.evaluation.vggish import vggish_embeddings
        from consistencytta_tpu.io.audio import write_wav

        sd = dict(vggish_sd)
        # transposed conv tensor: transposes fine, must still be caught
        sd["features.6.weight"] = np.transpose(
            sd["features.6.weight"], (1, 0, 2, 3)
        )
        ckpt = str(tmp_path / "vggish_bad.pth")
        _save_torch(sd, ckpt)
        wav = str(tmp_path / "a.wav")
        write_wav(wav, np.zeros(32000, np.float32))

        with pytest.raises(ValueError, match=r"features|conv"):
            vggish_embeddings([wav], ckpt)


class TestCLAPCorruption:
    def test_wrong_shape_named(self):
        """The exact path CLAPWrapper.from_checkpoint runs: infer configs,
        convert, validate against the towers."""
        import jax
        import jax.numpy as jnp

        from consistencytta_tpu.evaluation.clap_model import (
            CLAPTextTower,
            convert_clap_text,
            infer_clap_configs,
        )
        from consistencytta_tpu.io.torch_import import assert_params_match
        from tests.conftest import load_repo_tool

        make_clap_state_dict = load_repo_tool("make_tiny_clap").make_clap_state_dict
        sd = make_clap_state_dict()
        key = next(
            k for k in sd
            if "text_branch.encoder.layer.0.attention.self.query.weight" in k
        )
        sd[key] = sd[key][:, :-1]  # clipped hidden dim
        tcfg = infer_clap_configs(sd)[1]
        text = convert_clap_text(sd, tcfg)
        expected = jax.eval_shape(
            CLAPTextTower(tcfg).init, jax.random.PRNGKey(0),
            jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        )["params"]
        # the error names the offending tensor by its converted param path
        # (roberta q kernel) with both shapes
        with pytest.raises(ValueError, match=r"layer_0/q/kernel"):
            assert_params_match(text, expected, "corrupted clap")

    def test_missing_key_named(self):
        from consistencytta_tpu.evaluation.clap_model import (
            convert_clap_audio,
            infer_clap_configs,
        )
        from tests.conftest import load_repo_tool

        make_clap_state_dict = load_repo_tool("make_tiny_clap").make_clap_state_dict
        sd = make_clap_state_dict()
        key = next(k for k in sd if "audio_projection.0.weight" in k)
        del sd[key]
        acfg = infer_clap_configs(sd)[0]
        with pytest.raises((KeyError, ValueError), match="audio_projection"):
            convert_clap_audio(sd, acfg)
