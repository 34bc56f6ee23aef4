"""Composed waveform-level parity vs the reference pipelines.

Runs the reference's OWN `AudioLCM.inference` / `AudioGDM.inference`
(models/audio_consistency_model.py:429-548, models/audio_guided_model.py:
171-244) and its own decode chain (autoencoder.py:102-111 +
hifigan/utilities.py vocoder_infer) at a tiny-width / production-geometry
config with random torch init, ports the same weights through
io.torch_import, and asserts waveform allclose against our fused
`build_generate_fn` / `build_guided_student_generate_fn` /
`build_teacher_generate_fn` graphs. This converts the per-module parity
tests into an end-to-end FAD-parity guarantee for the composition
(scale -> query -> post-CFG mix -> multi-step re-noise -> decode -> DC
centering).

The reference model classes load T5/schedulers from the hub and CLAP/audio
deps unavailable offline; the `reference_world` fixture stubs exactly those
import-time externals (wandb, torchaudio, laion_clap, soundfile, librosa,
resampy) and patches `from_pretrained` to locally constructed modules. The
*math* under test is untouched reference code.
"""

import dataclasses
import importlib.machinery
import json
import sys
import types

import numpy as np
import pytest

from tests.conftest import (
    import_reference_audioldm,
    import_reference_diffusers,
    reference_available,
)

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

B = 2
TEXT_LEN = 8

TINY_UNET = {
    "in_channels": 8,
    "out_channels": 8,
    "block_out_channels": [16, 16, 32, 32],
    "down_block_types": [
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D",
    ],
    "up_block_types": [
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    ],
    "layers_per_block": 2,
    "attention_head_dim": [2, 2, 4, 4],
    "cross_attention_dim": 32,
    "norm_num_groups": 8,
    "use_linear_projection": True,
    "upcast_attention": True,
}

_STUB_NAMES = ("wandb", "torchaudio", "torchaudio.functional", "laion_clap",
               "soundfile", "librosa", "resampy")


def _install_stubs():
    saved = {n: sys.modules.get(n) for n in _STUB_NAMES}
    for name in _STUB_NAMES:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["torchaudio.functional"].resample = lambda x, *a, **k: x
    sys.modules["wandb"].init = lambda *a, **k: None
    sys.modules["wandb"].log = lambda *a, **k: None

    class _DummyCLAP:
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, name):
            return lambda *a, **k: None

    sys.modules["laion_clap"].CLAP_Module = _DummyCLAP
    return saved


def _restore_stubs(saved):
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Reference AudioLCM + torch codec + our pipeline/params, same weights."""
    import jax

    saved = _install_stubs()
    try:
        import_reference_diffusers()
        vae_mod, hifigan = import_reference_audioldm()

        import torch
        from accelerate import PartialState
        from transformers import T5Config as HFT5Config
        from transformers import T5EncoderModel

        PartialState(cpu=True)

        import models.audio_consistency_model as acm
        import models.audio_distilled_model as adm
        import models.audio_guided_model as agm

        from tests.test_schedulers import make_reference_ddim, make_reference_heun

        # -- torch side -----------------------------------------------------
        torch.manual_seed(0)
        tiny_t5 = T5EncoderModel(HFT5Config(
            vocab_size=256, d_model=32, d_kv=16, d_ff=64, num_layers=2,
            num_heads=2, relative_attention_num_buckets=32,
            relative_attention_max_distance=128,
            feed_forward_proj="gated-gelu", dropout_rate=0.0,
        ))
        tiny_t5.eval()

        cfg_dir = tmp_path_factory.mktemp("cfg")
        cfg_path = str(cfg_dir / "tiny_light_unet.json")
        with open(cfg_path, "w") as f:
            json.dump(TINY_UNET, f)

        # torch VAE (production geometry, narrow) + tiny vocoder
        torch.manual_seed(1)
        torch_vae = vae_mod.AutoencoderKL(
            ddconfig=dict(
                double_z=True, z_channels=8, resolution=256,
                downsample_time=False, in_channels=1, out_ch=1, ch=32,
                ch_mult=[1, 2, 4], num_res_blocks=2, attn_resolutions=[],
                dropout=0.0,
            ),
            embed_dim=8,
            scale_factor=0.9,
        )
        torch_vae.eval()
        from audioldm.hifigan.utilities import HIFIGAN_16K_64

        torch.manual_seed(2)
        voc_cfg_t = hifigan.AttrDict(
            {**HIFIGAN_16K_64, "upsample_initial_channel": 64}
        )
        torch_voc = hifigan.Generator(voc_cfg_t)
        torch_voc.eval()
        torch_voc.remove_weight_norm()
        torch_vae.vocoder = torch_voc  # decode_to_waveform uses self.vocoder
        torch_vae.requires_grad_(False)  # check_eval_mode asserts frozen

        class _FakeT5Cls:
            @staticmethod
            def from_pretrained(*a, **k):
                return tiny_t5

        class _FakeTok:
            model_max_length = TEXT_LEN

            @staticmethod
            def from_pretrained(*a, **k):
                return _FakeTok()

        class _FakeHeun:
            @staticmethod
            def from_pretrained(*a, **k):
                return make_reference_heun(18)

        class _FakeDDIM:
            @staticmethod
            def from_pretrained(*a, **k):
                return make_reference_ddim(18)

        saved_syms = [
            (adm, "T5EncoderModel", adm.T5EncoderModel),
            (adm, "AutoTokenizer", adm.AutoTokenizer),
            (acm, "HeunDiscreteScheduler", acm.HeunDiscreteScheduler),
            (acm, "DDIMScheduler", acm.DDIMScheduler),
        ]
        adm.T5EncoderModel = _FakeT5Cls
        adm.AutoTokenizer = _FakeTok
        acm.HeunDiscreteScheduler = _FakeHeun
        acm.DDIMScheduler = _FakeDDIM

        torch.manual_seed(3)
        model = acm.AudioLCM(
            text_encoder_name="tiny-t5",
            scheduler_name="stub",
            unet_model_config_path=cfg_path,
            use_edm=True,
            num_diffusion_steps=18,
            teacher_guidance_scale=-1,
            vae=torch_vae,
            loss_type="mse",
        )
        model.eval()
        for mod_, name, val in saved_syms:
            setattr(mod_, name, val)

        # fixed tokens, shared by both sides
        nprng = np.random.default_rng(0)
        ids = nprng.integers(2, 256, (B, TEXT_LEN)).astype(np.int64)
        mask = np.ones((B, TEXT_LEN), np.int64)
        mask[0, 5:] = 0
        uids = np.zeros((B, TEXT_LEN), np.int64)
        uids[:, 0] = 1
        umask = np.zeros((B, TEXT_LEN), np.int64)
        umask[:, 0] = 1

        class _Tok:
            model_max_length = TEXT_LEN

            def __call__(self, prompts, max_length=None, padding=True,
                         truncation=True, return_tensors="pt"):
                i, m = (uids, umask) if all(p == "" for p in prompts) else (ids, mask)
                return types.SimpleNamespace(
                    input_ids=torch.from_numpy(i),
                    attention_mask=torch.from_numpy(m),
                )

        model.tokenizer = _Tok()

        # -- our side ---------------------------------------------------------
        from consistencytta_tpu.configs import (
            HiFiGANConfig,
            LatentShape,
            PipelineConfig,
            UNetConfig,
            VAEConfig,
        )
        from consistencytta_tpu.io.torch_import import (
            convert_hifigan,
            convert_t5,
            convert_unet,
            convert_vae,
        )
        from consistencytta_tpu.models.pipeline import Pipeline, PipelineParams

        base = PipelineConfig.tiny()
        config = dataclasses.replace(
            base,
            unet=UNetConfig.from_diffusers_json(TINY_UNET),
            vae=VAEConfig(base_channels=32, norm_num_groups=32, scale_factor=0.9),
            vocoder=HiFiGANConfig(upsample_initial_channel=64),
            latent=LatentShape(t=256, f=16, c=8),
            segment_samples=1024 * 160,
            target_mel_frames=1024,
        )
        pipeline = Pipeline.create(config)

        def t2n(m):
            return {k: v.detach().numpy() for k, v in m.state_dict().items()}

        guided_cfg = config.unet
        teacher_cfg = UNetConfig.from_dict(
            {**guided_cfg.to_dict(), "guided": False}
        )
        vae_sd = {
            k: v for k, v in t2n(torch_vae).items()
            if not k.startswith("vocoder.")
        }
        params = PipelineParams(
            student=convert_unet(t2n(model.student_unet), guided_cfg),
            student_target=convert_unet(t2n(model.student_target_unet), guided_cfg),
            student_ema=convert_unet(t2n(model.student_ema_unet), guided_cfg),
            teacher=convert_unet(t2n(model.teacher_unet), teacher_cfg),
            vae=convert_vae(vae_sd, config.vae),
            vocoder=convert_hifigan(t2n(torch_voc), config.vocoder),
            t5=convert_t5(t2n(tiny_t5), config.t5.num_layers),
        )

        yield dict(
            torch=torch, model=model, torch_vae=torch_vae, acm=acm, agm=agm,
            make_heun=make_reference_heun, make_ddim=make_reference_ddim,
            pipeline=pipeline, params=params, config=config,
            ids=ids, mask=mask, uids=uids, umask=umask, nprng=nprng,
        )
    finally:
        _restore_stubs(saved)


def _torch_decode(world, latents):
    """The reference inference.py decode chain (inference.py:206-208):
    decode_first_stage -> decode_to_waveform (vocoder + DC centering)."""
    torch = world["torch"]
    with torch.no_grad():
        mel = world["torch_vae"].decode_first_stage(latents.float())
        wav = world["torch_vae"].decode_to_waveform(mel.float(), allow_grad=True)
    # reference truncates to 10 s (inference.py:208)
    return wav.detach().numpy()[:, : 16000 * 10]


def _fixed_draws(world, monkeypatch, draws_nchw):
    """Pin both RNG streams to the same draw sequence (NCHW on torch,
    NHWC transposed on jax)."""
    import jax
    import jax.numpy as jnp

    torch = world["torch"]
    seq_t = iter([torch.from_numpy(d) for d in draws_nchw])
    seq_j = iter([jnp.asarray(np.transpose(d, (0, 2, 3, 1))) for d in draws_nchw])

    monkeypatch.setattr(
        world["acm"], "randn_tensor", lambda shape, **k: next(seq_t)
    )
    monkeypatch.setattr(
        world["agm"], "randn_tensor", lambda shape, **k: next(seq_t)
    )
    monkeypatch.setattr(torch, "randn_like", lambda x, **k: next(seq_t))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: next(seq_j),
    )


def _run_ours(world, gen_cfg):
    import jax

    from consistencytta_tpu.inference.generate import build_generate_fn

    generate = build_generate_fn(world["pipeline"], gen_cfg, jit=False)
    wav = generate(
        world["params"], world["ids"], world["mask"], world["uids"],
        world["umask"], jax.random.PRNGKey(0), np.float32(3.0),
    )
    return np.asarray(wav)


@requires_reference
@pytest.mark.slow
class TestAudioLCMComposedParity:
    def _compare(self, world, monkeypatch, use_edm, num_steps, post):
        from consistencytta_tpu.inference.generate import GenerateConfig

        torch = world["torch"]
        latent_nchw = (B, 8, 256, 16)
        n_draws = 1 + max(num_steps - 1, 0)
        draws = [
            world["nprng"].standard_normal(latent_nchw).astype(np.float32)
            for _ in range(n_draws)
        ]
        # torch and jax consume independent iterators over the same draws
        _fixed_draws(world, monkeypatch, draws)

        sched = world["make_heun"](18) if use_edm else world["make_ddim"](18)
        with torch.no_grad():
            latents = world["model"].inference(
                ["a", "b"], sched, guidance_scale_input=3.0,
                guidance_scale_post=post, num_steps=num_steps,
                use_edm=use_edm, use_ema=True,
            )
        want = _torch_decode(world, latents)

        got = _run_ours(
            world,
            GenerateConfig(
                num_steps=num_steps, guidance_post=post, use_ema=True,
                use_edm=use_edm,
            ),
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_one_step_edm(self, world, monkeypatch):
        self._compare(world, monkeypatch, use_edm=True, num_steps=1, post=1.0)

    def test_two_step_edm_renoise(self, world, monkeypatch):
        self._compare(world, monkeypatch, use_edm=True, num_steps=2, post=1.0)

    def test_one_step_post_cfg(self, world, monkeypatch):
        self._compare(world, monkeypatch, use_edm=True, num_steps=1, post=3.0)

    def test_two_step_ddim(self, world, monkeypatch):
        self._compare(world, monkeypatch, use_edm=False, num_steps=2, post=1.0)


@requires_reference
@pytest.mark.slow
class TestTeacherComposedParity:
    def test_teacher_heun_rollout(self, world, monkeypatch):
        """query_teacher=True path (audio_consistency_model.py:515-534) vs
        build_teacher_generate_fn: full multi-step CFG Heun solve."""
        import jax

        from consistencytta_tpu.inference.generate import build_teacher_generate_fn

        torch = world["torch"]
        draws = [
            world["nprng"].standard_normal((B, 8, 256, 16)).astype(np.float32)
        ]
        _fixed_draws(world, monkeypatch, draws)

        sched = world["make_heun"](18)
        with torch.no_grad():
            _, latents_tea, _, _ = world["model"].inference(
                ["a", "b"], sched, guidance_scale_input=3.0,
                guidance_scale_post=1.0, num_steps=1, use_edm=True,
                use_ema=True, query_teacher=True, num_teacher_steps=4,
                return_all=True,
            )
        want = _torch_decode(world, latents_tea)

        # re-pin the jax stream (the torch side consumed the shared draw)
        _fixed_draws(world, monkeypatch, draws)
        generate = build_teacher_generate_fn(
            world["pipeline"], num_steps=4, use_edm=True, jit=False
        )
        got = np.asarray(generate(
            world["params"], world["ids"], world["mask"], world["uids"],
            world["umask"], jax.random.PRNGKey(0), np.float32(3.0),
        ))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@requires_reference
@pytest.mark.slow
class TestGuidedStudentComposedParity:
    def test_audiogdm_ddim_rollout(self, world, monkeypatch):
        """AudioGDM.inference (models/audio_guided_model.py:171-244) vs
        build_guided_student_generate_fn — called unbound on the same module
        set (AudioGDM adds no state beyond AudioDistilledModel's)."""
        import jax

        from consistencytta_tpu.inference.generate import (
            build_guided_student_generate_fn,
        )

        torch = world["torch"]
        draws = [
            world["nprng"].standard_normal((B, 8, 256, 16)).astype(np.float32)
        ]
        _fixed_draws(world, monkeypatch, draws)

        sched = world["make_ddim"](18)
        with torch.no_grad():
            latents = world["agm"].AudioGDM.inference(
                world["model"], ["a", "b"], sched, guidance_scale_input=3.0,
                guidance_scale_post=1.0, num_steps=4, use_edm=False,
                use_ema=True,
            )
        want = _torch_decode(world, latents)

        _fixed_draws(world, monkeypatch, draws)
        generate = build_guided_student_generate_fn(
            world["pipeline"], num_steps=4, use_edm=False, jit=False
        )
        got = np.asarray(generate(
            world["params"], world["ids"], world["mask"], world["uids"],
            world["umask"], jax.random.PRNGKey(0), np.float32(3.0),
        ))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
