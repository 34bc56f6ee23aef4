"""Scheduler parity tests against the reference torch implementations.

These run the vendored reference schedulers (modified HF Diffusers) side by
side with the pure-functional JAX tables/steps and assert numerical parity,
covering the reference's batched-timestep modifications
(scheduling_heun_discrete.py:137-149, scheduling_ddim.py:297-321).
"""

import numpy as np
import pytest

from consistencytta_tpu.configs import SchedulerConfig
from consistencytta_tpu.ops.schedulers import (
    make_alphas_cumprod,
    make_ddim_schedule,
    make_ddpm_schedule,
    make_heun_schedule,
    min_snr_weights_stage1,
    min_snr_weights_stage2,
)
from tests.conftest import import_reference_diffusers, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = SchedulerConfig()  # SD-2.1: scaled_linear 0.00085->0.012, v_prediction


def make_reference_heun(num_steps=18, use_karras=False):
    import_reference_diffusers()
    from diffusers import HeunDiscreteScheduler

    sched = HeunDiscreteScheduler(
        num_train_timesteps=CFG.num_train_timesteps,
        beta_start=CFG.beta_start,
        beta_end=CFG.beta_end,
        beta_schedule=CFG.beta_schedule,
        prediction_type=CFG.prediction_type,
        use_karras_sigmas=use_karras,
    )
    sched.set_timesteps(num_steps)
    return sched


def make_reference_ddim(num_steps=18):
    import_reference_diffusers()
    from diffusers import DDIMScheduler

    # match the stabilityai/stable-diffusion-2-1 scheduler_config.json the
    # reference pulls from the hub: clip_sample=false, set_alpha_to_one=false
    sched = DDIMScheduler(
        num_train_timesteps=CFG.num_train_timesteps,
        beta_start=CFG.beta_start,
        beta_end=CFG.beta_end,
        beta_schedule=CFG.beta_schedule,
        prediction_type=CFG.prediction_type,
        clip_sample=False,
        set_alpha_to_one=False,
    )
    sched.set_timesteps(num_steps)
    return sched


@requires_reference
class TestHeunTables:
    @pytest.mark.parametrize("use_karras", [False, True])
    def test_tables_match(self, use_karras):
        ref = make_reference_heun(18, use_karras)
        ours = make_heun_schedule(CFG, 18, use_karras)

        # reference stores duplicated arrays; dedup to unique
        ref_t = ref.timesteps.numpy()
        ref_sig = ref.sigmas.numpy()
        uniq_t = np.concatenate([ref_t[:1], ref_t[1::2]])
        uniq_sig = np.concatenate([ref_sig[:1], ref_sig[1::2]])

        np.testing.assert_allclose(np.asarray(ours.timesteps), uniq_t, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.sigmas), uniq_sig, rtol=1e-5)
        np.testing.assert_allclose(
            float(ours.init_noise_sigma), float(ref.init_noise_sigma), rtol=1e-6
        )

    def test_alphas_cumprod_match(self):
        import torch

        import_reference_diffusers()
        from diffusers import DDPMScheduler

        ref = DDPMScheduler(
            num_train_timesteps=1000,
            beta_start=CFG.beta_start,
            beta_end=CFG.beta_end,
            beta_schedule=CFG.beta_schedule,
            prediction_type=CFG.prediction_type,
        )
        np.testing.assert_allclose(
            make_alphas_cumprod(CFG), ref.alphas_cumprod.numpy(), rtol=3e-6
        )


@requires_reference
class TestHeunOps:
    def setup_method(self, _):
        self.rng = np.random.default_rng(1)

    def test_add_noise_and_scale_batched(self):
        import torch

        ref = make_reference_heun()
        ours = make_heun_schedule(CFG, 18)
        x0 = self.rng.standard_normal((4, 8, 16, 2)).astype(np.float32)
        noise = self.rng.standard_normal((4, 8, 16, 2)).astype(np.float32)

        # pick unique indices 0, 3, 7, 17 -> duplicated indices 0, 6, 14, 34
        uniq_idx = np.array([0, 3, 7, 17])
        dup_idx = np.where(uniq_idx == 0, 0, uniq_idx * 2)
        # reference matches timesteps by exact equality -> use its float64 t
        t = ref.timesteps.numpy()[dup_idx]
        sigma = np.asarray(ours.sigmas)[uniq_idx]

        ref_noisy = ref.add_noise(
            torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t)
        ).numpy()
        got_noisy = np.asarray(ours.add_noise(x0, noise, sigma))
        np.testing.assert_allclose(got_noisy, ref_noisy, rtol=1e-5, atol=1e-6)

        ref_scaled = ref.scale_model_input(
            torch.from_numpy(ref_noisy), torch.from_numpy(t)
        ).numpy()
        got_scaled = np.asarray(ours.scale_model_input(got_noisy, sigma))
        np.testing.assert_allclose(got_scaled, ref_scaled, rtol=1e-5, atol=1e-6)

    def _fake_model_np(self, z_scaled, t):
        # deterministic fake velocity model, identical in torch/jax
        return 0.1 * z_scaled + 0.01 * np.float32(1.0) * np.reshape(
            np.asarray(t, np.float32) / 1000.0, (-1, 1, 1, 1)
        )

    def test_heun_pair_matches_reference_state_machine(self):
        import torch

        ref = make_reference_heun()
        ours = make_heun_schedule(CFG, 18)

        z = self.rng.standard_normal((2, 8, 16, 2)).astype(np.float32)
        uniq_idx = 5  # interval sigma_5 -> sigma_6
        # reference matches timesteps by exact equality -> float64 t for it
        t_cur_ref = np.full((2,), ref.timesteps.numpy()[uniq_idx * 2])
        t_next_ref = np.full((2,), ref.timesteps.numpy()[(uniq_idx + 1) * 2])
        t_cur = t_cur_ref.astype(np.float32)
        t_next = t_next_ref.astype(np.float32)
        s_cur = np.full((2,), np.asarray(ours.sigmas)[uniq_idx], np.float32)
        s_next = np.full((2,), np.asarray(ours.sigmas)[uniq_idx + 1], np.float32)

        # --- reference: stateful two-step sequence
        assert ref.state_in_first_order
        zt = torch.from_numpy(z)
        z_scaled = ref.scale_model_input(zt, torch.from_numpy(t_cur_ref))
        v1 = torch.from_numpy(self._fake_model_np(z_scaled.numpy(), t_cur))
        z_mid_ref = ref.step(v1, torch.from_numpy(t_cur_ref), zt).prev_sample
        assert not ref.state_in_first_order
        z_mid_scaled = ref.scale_model_input(z_mid_ref, torch.from_numpy(t_next_ref))
        v2 = torch.from_numpy(self._fake_model_np(z_mid_scaled.numpy(), t_next))
        z_next_ref = ref.step(v2, torch.from_numpy(t_next_ref), z_mid_ref).prev_sample
        assert ref.state_in_first_order

        # --- ours: explicit pure pair
        def model_fn(z_scaled, t, sigma):
            return self._fake_model_np(np.asarray(z_scaled), np.asarray(t))

        z_next, z_mid = ours.heun_pair(z, s_cur, s_next, model_fn, t_cur, t_next)
        np.testing.assert_allclose(
            np.asarray(z_mid), z_mid_ref.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(z_next), z_next_ref.numpy(), rtol=1e-5, atol=1e-6
        )

    def test_full_sample_loop_matches_reference(self):
        """The 35-eval teacher rollout: Heun every interval + final Euler.

        Mirrors the reference inference loop over duplicated timesteps
        (models/audio_consistency_model.py:518-524)."""
        import torch

        ref = make_reference_heun()
        ours = make_heun_schedule(CFG, 18)

        noise = self.rng.standard_normal((2, 8, 16, 2)).astype(np.float32)
        z_ref = torch.from_numpy(noise) * ref.init_noise_sigma
        for t in ref.timesteps:
            z_scaled = ref.scale_model_input(z_ref, t)
            v = torch.from_numpy(
                self._fake_model_np(
                    z_scaled.numpy(), np.full((2,), float(t), np.float32)
                )
            )
            z_ref = ref.step(v, t, z_ref).prev_sample

        import jax.numpy as jnp

        def model_fn(z_scaled, t, sigma):
            # jnp twin of _fake_model_np (sample_loop traces through scan)
            return 0.1 * z_scaled + 0.01 * jnp.reshape(
                t.astype(jnp.float32) / 1000.0, (-1, 1, 1, 1)
            )

        z0 = noise * float(ours.init_noise_sigma)
        z_got = ours.sample_loop(jnp.asarray(z0), model_fn)
        np.testing.assert_allclose(
            np.asarray(z_got), z_ref.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_snr_is_inverse_sigma_squared(self):
        ours = make_heun_schedule(CFG, 18)
        idx = np.array([0, 5, 17])
        np.testing.assert_allclose(
            np.asarray(ours.snr(idx)),
            np.asarray(ours.sigmas)[idx] ** -2.0,
            rtol=1e-6,
        )


@requires_reference
class TestDDIM:
    def test_timesteps(self):
        ref = make_reference_ddim(18)
        ours = make_ddim_schedule(CFG, 18)
        np.testing.assert_array_equal(
            np.asarray(ours.timesteps), ref.timesteps.numpy()
        )

    def test_step_batched_v_prediction(self):
        import torch

        rng = np.random.default_rng(2)
        ref = make_reference_ddim(18)
        ours = make_ddim_schedule(CFG, 18)

        sample = rng.standard_normal((3, 8, 16, 2)).astype(np.float32)
        v = rng.standard_normal((3, 8, 16, 2)).astype(np.float32)
        t = np.asarray(ours.timesteps)[np.array([0, 9, 17])].astype(np.int64)

        ref_out = ref.step(
            torch.from_numpy(v), torch.from_numpy(t), torch.from_numpy(sample)
        ).prev_sample.numpy()
        got = np.asarray(ours.step(v, t, sample))
        np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)

    def test_add_noise(self):
        import torch

        rng = np.random.default_rng(3)
        ref = make_reference_ddim(18)
        ours = make_ddim_schedule(CFG, 18)
        x0 = rng.standard_normal((2, 4)).astype(np.float32)
        noise = rng.standard_normal((2, 4)).astype(np.float32)
        t = np.array([55, 935], dtype=np.int64)
        ref_out = ref.add_noise(
            torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t)
        ).numpy()
        np.testing.assert_allclose(
            np.asarray(ours.add_noise(x0, noise, t)), ref_out, rtol=1e-6
        )


class TestDDPMAndWeights:
    def test_ddpm_snr(self):
        sched = make_ddpm_schedule(CFG)
        t = np.array([0, 500, 999])
        abar = make_alphas_cumprod(CFG)[t]
        np.testing.assert_allclose(
            np.asarray(sched.snr(t)), abar / (1 - abar), rtol=1e-6
        )

    def test_min_snr_weights(self):
        snr = np.array([0.1, 5.0, 100.0], np.float32)
        w1 = np.asarray(min_snr_weights_stage1(snr, 5.0, "v_prediction"))
        np.testing.assert_allclose(
            w1, np.minimum(snr, 5.0) / (snr + 1.0), rtol=1e-6
        )
        w2 = np.asarray(min_snr_weights_stage2(snr, 5.0))
        np.testing.assert_allclose(w2, np.minimum(snr, 5.0), rtol=1e-6)

    def test_ddpm_add_noise_shapes(self):
        rng = np.random.default_rng(4)
        sched = make_ddpm_schedule(CFG)
        x0 = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        noise = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
        z = sched.add_noise(x0, noise, np.array([10, 990]))
        assert z.shape == x0.shape
        # late timestep nearly pure noise
        np.testing.assert_allclose(
            np.asarray(z[1]), noise[1] * np.sqrt(1 - make_alphas_cumprod(CFG)[990])
            + x0[1] * np.sqrt(make_alphas_cumprod(CFG)[990]),
            rtol=1e-5,
        )
