"""Composed TRAINING-forward parity vs the reference model classes.

Inference has 9 composed waveform-parity tests (test_composed_parity.py);
these do the same for the training forwards: inject identical fixed draws
(timestep indices, noise, guidance w) into the reference's own
`AudioLCM.forward` (models/audio_consistency_model.py:239-427) /
`AudioGDM.forward` (models/audio_guided_model.py:87-169) and this repo's
`consistency_forward` / `guided_distill_loss` / `build_validation_step`,
with the same ported weights, and assert the LOSS VALUES agree — the
stage-2 target construction (adjacent Heun pair -> teacher solver steps ->
target-net query -> min-SNR-weighted loss) is compared as one composition,
not piecewise.

Randomness is pinned on both sides (torch.randint/randn_like/rand and
jax.random.randint/normal/uniform); `Pipeline.encode_audio` is patched to
the fixed ground-truth latent because the reference forward takes z_0
directly while ours encodes the waveform in-graph.
"""

import numpy as np
import pytest

from tests.conftest import reference_available
from tests.test_composed_parity import B, TEXT_LEN, world  # noqa: F401

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

LATENT_NCHW = (B, 8, 256, 16)
SNR_GAMMA = 5.0


def _fixed_training_draws(world, monkeypatch, *, eps_nchw, w_raw, u_vals=None,
                          torch_u_vals=None):
    """Pin torch.{randint,randn_like,rand} and jax.random.{randint,normal,
    uniform} to the same fixed draws. `u_vals` feeds our randint;
    `torch_u_vals` (defaults to u_vals) feeds the reference's."""
    import jax
    import jax.numpy as jnp

    torch = world["torch"]
    eps_t = torch.from_numpy(eps_nchw)
    eps_j = jnp.asarray(np.transpose(eps_nchw, (0, 2, 3, 1)))
    w_t = torch.from_numpy(w_raw)
    w_j = jnp.asarray(w_raw)

    monkeypatch.setattr(torch, "randn_like", lambda x, **k: eps_t)
    monkeypatch.setattr(torch, "rand", lambda *a, **k: w_t)
    if torch_u_vals is None:
        torch_u_vals = u_vals
    if torch_u_vals is not None:
        u_t = torch.from_numpy(np.asarray(torch_u_vals, np.int64))
        monkeypatch.setattr(torch, "randint", lambda *a, **k: u_t)

    monkeypatch.setattr(
        jax.random, "normal", lambda key, shape, dtype=jnp.float32: eps_j
    )
    monkeypatch.setattr(
        jax.random, "uniform", lambda key, shape=None, **k: w_j
    )
    if u_vals is not None:
        u_j = jnp.asarray(np.asarray(u_vals, np.int32))
        monkeypatch.setattr(
            jax.random, "randint", lambda key, shape, minval, maxval, **k: u_j
        )


def _patch_encode_audio(monkeypatch, z0_nchw):
    """Pipeline.encode_audio -> the fixed ground-truth latent (NHWC)."""
    import jax.numpy as jnp

    from consistencytta_tpu.models.pipeline import Pipeline

    z0_j = jnp.asarray(np.transpose(z0_nchw, (0, 2, 3, 1)))
    monkeypatch.setattr(
        Pipeline, "encode_audio", lambda self, vae, wav, rng: z0_j
    )


def _our_micro(world):
    import jax.numpy as jnp

    cfg = world["config"]
    return {
        "wav": jnp.zeros((B, cfg.segment_samples), jnp.float32),  # unused
        "ids": jnp.asarray(world["ids"].astype(np.int32)),
        "mask": jnp.asarray(world["mask"].astype(np.int32)),
        "uncond_ids": jnp.asarray(world["uids"].astype(np.int32)),
        "uncond_mask": jnp.asarray(world["umask"].astype(np.int32)),
    }


def _our_frozen(world):
    import dataclasses

    from consistencytta_tpu.models.pipeline import PipelineParams

    p = world["params"]
    return PipelineParams(
        teacher=p.teacher, vae=p.vae, vocoder=p.vocoder, t5=p.t5
    )


@requires_reference
@pytest.mark.slow
class TestStage2TrainingForwardParity:
    @pytest.mark.parametrize(
        "u_vals",
        [[0, 7], [16, 3]],  # u=0: pure-noise resample; u=16: t_n == 0 target
        ids=["edge-pure-noise", "edge-tn-zero"],
    )
    def test_training_mode_loss_matches(self, world, monkeypatch, u_vals):
        """Reference AudioLCM.forward(validation_mode=0) vs our
        consistency_forward + min-SNR-weighted mse, same draws/weights
        (audio_consistency_model.py:269-427 training branch)."""
        import jax

        from consistencytta_tpu.ops.schedulers import (
            make_heun_schedule,
            min_snr_weights_stage2,
        )
        from consistencytta_tpu.training.losses import mse_instance
        from consistencytta_tpu.training.step import (
            ConsistencyStepConfig,
            consistency_forward,
        )

        torch = world["torch"]
        model = world["model"]
        nprng = np.random.default_rng(11)
        z0 = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        eps = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        w_raw = nprng.uniform(0.0, 1.0, (B,)).astype(np.float32)

        _fixed_training_draws(
            world, monkeypatch, eps_nchw=eps, w_raw=w_raw, u_vals=u_vals
        )
        _patch_encode_audio(monkeypatch, z0)
        monkeypatch.setattr(model, "snr_gamma", SNR_GAMMA, raising=False)

        with torch.no_grad():
            want = float(model.forward(
                torch.from_numpy(z0), None, ["a", "b"], validation_mode=0
            ))

        cfg = ConsistencyStepConfig(
            snr_gamma=SNR_GAMMA, use_edm=True, remat_student=False
        )
        sched = make_heun_schedule(world["config"].scheduler, 18)
        p = world["params"]
        pred, target, snr = consistency_forward(
            world["pipeline"], sched, cfg, p.student, p.student_target,
            _our_frozen(world), _our_micro(world), jax.random.PRNGKey(0),
        )
        inst = mse_instance(pred, target) * min_snr_weights_stage2(
            snr, SNR_GAMMA
        )
        got = float(inst.mean())

        assert np.isfinite(want) and want > 0
        np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_validation_mode_four_losses_match(self, world, monkeypatch):
        """Reference AudioLCM.forward(validation_mode=n-1, run_teacher=True)
        — pure noise at t_0, target-net pair, full 18-step teacher rollout —
        vs build_validation_step's 4-loss dict
        (audio_consistency_model.py:354-405; tools/train_utils.py:97)."""
        import jax
        import jax.numpy as jnp
        import optax

        from consistencytta_tpu.ops.schedulers import make_heun_schedule
        from consistencytta_tpu.training.step import (
            ConsistencyStepConfig,
            TrainState,
            build_validation_step,
        )

        torch = world["torch"]
        model = world["model"]
        nprng = np.random.default_rng(13)
        z0 = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        eps = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        w_raw = nprng.uniform(0.0, 1.0, (B,)).astype(np.float32)

        _fixed_training_draws(world, monkeypatch, eps_nchw=eps, w_raw=w_raw)
        _patch_encode_audio(monkeypatch, z0)
        monkeypatch.setattr(model, "snr_gamma", SNR_GAMMA, raising=False)

        with torch.no_grad():
            ref = model.forward(
                torch.from_numpy(z0), None, ["a", "b"],
                validation_mode=17, run_teacher=True,
            )
        want = {
            "loss_w_gt": float(ref[0]),
            "loss_w_teacher": float(ref[1]),
            "loss_consistency": float(ref[2]),
            "loss_teacher": float(ref[3]),
        }

        cfg = ConsistencyStepConfig(snr_gamma=SNR_GAMMA, use_edm=True)
        sched = make_heun_schedule(world["config"].scheduler, 18)
        validate = build_validation_step(world["pipeline"], sched, cfg)
        p = world["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            student=p.student,
            student_target=p.student_target,
            student_ema=p.student_ema,
            opt_state=optax.identity().init(p.student),
        )
        got = validate(
            state, _our_frozen(world), _our_micro(world), jax.random.PRNGKey(0)
        )

        for key, want_v in want.items():
            assert np.isfinite(want_v), key
            np.testing.assert_allclose(
                float(got[key]), want_v, rtol=3e-3, err_msg=key
            )


@requires_reference
@pytest.mark.slow
class TestStage1TrainingForwardParity:
    def test_guided_distill_loss_matches(self, world, monkeypatch):
        """Reference AudioGDM.forward (models/audio_guided_model.py:87-169)
        — called unbound on the same module set with a DDPM schedule swapped
        in and the base-class compute_snr (AudioLCM overrides it with the
        EDM variant) — vs guided_distill_loss, same draws/weights."""
        import jax

        from tests.conftest import import_reference_diffusers
        from tests.test_schedulers import CFG as SCHED_CFG

        import_reference_diffusers()
        from diffusers import DDPMScheduler

        from consistencytta_tpu.ops.schedulers import make_ddpm_schedule
        from consistencytta_tpu.training.step import (
            GuidedStepConfig,
            guided_distill_loss,
        )

        torch = world["torch"]
        model = world["model"]
        agm = world["agm"]

        import models.audio_distilled_model as adm

        ref_ddpm = DDPMScheduler(
            num_train_timesteps=SCHED_CFG.num_train_timesteps,
            beta_start=SCHED_CFG.beta_start,
            beta_end=SCHED_CFG.beta_end,
            beta_schedule=SCHED_CFG.beta_schedule,
            prediction_type=SCHED_CFG.prediction_type,
        )

        nprng = np.random.default_rng(17)
        z0 = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        eps = nprng.standard_normal(LATENT_NCHW).astype(np.float32)
        w_raw = nprng.uniform(0.0, 1.0, (B,)).astype(np.float32)
        # t=999 exercises the pure-noise resample branch; ours draws the
        # timestep value, the reference draws the index into the descending
        # table (t = 999 - index)
        t_vals = np.asarray([999, 421], np.int64)

        _fixed_training_draws(
            world, monkeypatch, eps_nchw=eps, w_raw=w_raw,
            u_vals=t_vals, torch_u_vals=999 - t_vals,
        )
        _patch_encode_audio(monkeypatch, z0)
        monkeypatch.setattr(model, "snr_gamma", SNR_GAMMA, raising=False)
        monkeypatch.setattr(model, "noise_scheduler", ref_ddpm, raising=False)
        monkeypatch.setattr(
            model, "compute_snr",
            lambda t: adm.AudioDistilledModel.compute_snr(model, t),
            raising=False,
        )

        with torch.no_grad():
            want = float(
                agm.AudioGDM.forward(model, torch.from_numpy(z0), ["a", "b"])
            )

        cfg = GuidedStepConfig(snr_gamma=SNR_GAMMA)
        sched = make_ddpm_schedule(world["config"].scheduler)
        got = float(guided_distill_loss(
            world["pipeline"], sched, cfg, world["params"].student,
            _our_frozen(world), _our_micro(world), jax.random.PRNGKey(0),
        ))

        assert np.isfinite(want) and want > 0
        np.testing.assert_allclose(got, want, rtol=2e-3)
