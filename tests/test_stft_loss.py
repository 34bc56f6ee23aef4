"""Parity of the multi-resolution STFT loss against a fixed copy of the
reference formulation.

The reference's MultiResolutionSTFTLoss (tools/losses.py:187-256, STFTLoss
:120-184) is the shipped 'stft' loss type — but upstream it crashes: forward
reads `self.sr` which no __init__ ever sets (tools/losses.py:240,243). The
torch copy below is the reference math verbatim with that one bug patched
(sr = 16000); the JAX implementation must match it to fp tolerance. The
decode chain is the identity here (latents == waveforms) — decode parity is
covered by the composed waveform tests; this isolates the loss math.

Shipped weights factor_sc=0.1 / factor_mag=0.1 / factor_mse=0.8 per
models/audio_consistency_model.py:95-99.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistencytta_tpu.training.losses import MultiResolutionSTFTLoss

SR = 16000  # the patched self.sr
FFTS = (1024, 2048, 512)
HOPS = (120, 240, 50)
WINS = (600, 1200, 240)


def _torch_reference_loss(wav_pred, wav_tgt):
    """Verbatim reference math (STFTLoss.stft :143-168,
    SpectralConvergengeLoss / LogSTFTMagnitudeLoss, MultiResolutionSTFTLoss
    .forward :225-256 with reduction='instance' and sr patched)."""
    import torch

    inp = torch.from_numpy(wav_pred)
    tgt = torch.from_numpy(wav_tgt)

    def stft_mag(x, fft, hop, win):
        window = torch.hann_window(win)
        x_stft = torch.view_as_real(
            torch.stft(x.double(), fft, hop, win, window, return_complex=True)
        )
        real, imag = x_stft[..., 0], x_stft[..., 1]
        mag = real**2 + imag**2
        return torch.clamp(mag, min=1e-8).sqrt().transpose(2, 1).float()

    # factor_mse * MSE on the "latents" (identity decode: the waveforms)
    raw = torch.nn.functional.mse_loss(inp.float(), tgt.float(), reduction="none")
    mse = raw.mean(dim=list(range(1, raw.ndim)))

    inp_w = inp[:, : SR * 10].float()
    tgt_w = tgt[:, : SR * 10].float()
    sc_loss = torch.zeros(inp.shape[0])
    mag_loss = torch.zeros(inp.shape[0])
    for fft, hop, win in zip(FFTS, HOPS, WINS):
        m_in = stft_mag(inp_w, fft, hop, win)
        m_tg = stft_mag(tgt_w, fft, hop, win)
        # SpectralConvergengeLoss: ||Y - X||_F / ||Y||_F per instance
        sc_loss = sc_loss + torch.norm(
            (m_tg - m_in).reshape(m_in.shape[0], -1), p="fro", dim=1
        ) / torch.norm(m_tg.reshape(m_tg.shape[0], -1), p="fro", dim=1)
        # LogSTFTMagnitudeLoss: L1 on log magnitudes per instance
        l1 = torch.abs(torch.log(m_tg) - torch.log(m_in))
        mag_loss = mag_loss + l1.mean(dim=list(range(1, l1.ndim)))
    sc_loss = sc_loss / len(FFTS)
    mag_loss = mag_loss / len(FFTS)
    return (0.8 * mse + 0.1 * mag_loss + 0.1 * sc_loss).numpy()


def test_multiresolution_stft_loss_matches_patched_reference():
    rng = np.random.default_rng(0)
    wav_tgt = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    wav_pred = wav_tgt + (rng.standard_normal((2, 8000)) * 0.05).astype(np.float32)

    want = _torch_reference_loss(wav_pred, wav_tgt)

    loss = MultiResolutionSTFTLoss(sr=SR)
    got = np.asarray(
        loss(jnp.asarray(wav_pred), jnp.asarray(wav_tgt), lambda z: z)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow  # grad-graph compile; the CLI chain test also covers this path
def test_stft_loss_is_differentiable():
    """--loss_type stft backprops through the decode path; the loss itself
    must yield finite grads (the custom overlap-add VJP of frame_signal is
    on this path, see PERF.md)."""
    rng = np.random.default_rng(1)
    wav_tgt = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32) * 0.2
    wav_pred = wav_tgt + 0.01

    loss = MultiResolutionSTFTLoss(sr=SR)
    g = jax.grad(lambda w: loss(w, wav_tgt, lambda z: z).mean())(wav_pred)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
