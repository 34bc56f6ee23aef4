"""Evaluation harness: directory-of-wavs in, metric dict out.

The EvaluationHelper equivalent (audioldm_eval/eval.py:59-349): checks the
generated/reference file-set intersection, extracts Cnn14 features (FD, KL,
ISc, KID), VGGish embeddings (FAD), CLAP embeddings (CLAP scores), computes
PSNR/SSIM on normalized log-mel and LSD/SSIM-STFT on waveforms, and writes
`*_evaluation_results.json`.

Backbones are pluggable: each is used only if its checkpoint/params are
provided, and missing backbones yield NaN for their metrics (with a
warning) instead of failing the run — the metric *math* is always available
(consistencytta_tpu.evaluation.metrics).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from consistencytta_tpu.configs import STFTConfig
from consistencytta_tpu.evaluation import metrics as M
from consistencytta_tpu.io.audio import read_wav, write_wav
from consistencytta_tpu.ops.resample import resample_numpy

RESULT_KEYS = [
    "frechet_distance", "frechet_audio_distance", "lsd", "psnr",
    "kullback_leibler_divergence_sigmoid", "kullback_leibler_divergence_softmax",
    "ssim", "ssim_stft", "inception_score_mean", "inception_score_std",
    "kernel_inception_distance_mean", "kernel_inception_distance_std",
    "gt_text_clap_score", "gen_text_clap_score", "gen_gt_clap_score",
]


def _list_wavs(directory: str) -> List[str]:
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".wav")
    )


def load_wav_16k(
    path: str, target_centisec: Optional[int] = None, pad_to_2s: bool = True
) -> np.ndarray:
    """Load + mean-center + resample to 16 kHz; optionally crop to
    target_centisec * 160 samples and (by default) pad to >= 2 s. Matches
    the eval protocol's read_centered_wav + WaveDataset.read_from_file
    (audioldm_eval/datasets/load_mel.py:17-29,123-151): integer-ratio
    downsampling is plain decimation (stride slicing), anything else goes
    through the kaiser_best-equivalent resampler, and the DC offset is
    removed before cropping. pad_to_2s=False gives the MelPairedDataset
    variant (read_centered_wav only: no crop, no minimum-length pad)."""
    wav, sr = read_wav(path)
    wav = wav.astype(np.float32)
    if sr != 16000:
        if sr % 16000 == 0:
            wav = wav[:: sr // 16000]
        else:
            wav = resample_numpy(wav, sr, 16000)
    wav = wav - wav.mean()
    if target_centisec is not None:
        wav = wav[: target_centisec * 160]
    if pad_to_2s and len(wav) < 32000:
        wav = np.pad(wav, (0, 32000 - len(wav)))
    return wav


def eval_mel_frontend():
    """The eval-protocol mel frontend (512-point, fmin 50 — differs from the
    training frontend, audioldm_eval/eval.py:90-93). Shared by the harness
    and by cli/inference.py's all_mels artifact writer so stored and
    recomputed mels are bit-identical."""
    from consistencytta_tpu.ops.stft import MelFrontend

    return MelFrontend(
        STFTConfig(
            filter_length=512,
            hop_length=160,
            win_length=512,
            mel_fmin=50.0,
        )
    )


def normalized_logmel(wav: np.ndarray, frontend) -> np.ndarray:
    """Eval-protocol mel image: log10 mel + SpecVQGAN normalization
    (mel * 20 - 20 + 100) / 100 clipped to [0, 1]
    (audioldm_eval/datasets/load_mel.py:100-120). The eval frontend differs
    from training: n_fft 512, fmin 50 (eval.py:90-93)."""
    import jax.numpy as jnp

    mel_ln, _ = frontend(wav[None, :])  # natural log
    mel_log10 = np.asarray(mel_ln)[0] / np.log(10.0)
    return np.clip((mel_log10 * 20 - 20 + 100) / 100, 0, 1)


@dataclass
class EvaluationHelper:
    """main(generated_dir, reference_dir, captions=...) -> metric dict."""

    sampling_rate: int = 16000
    cnn14_checkpoint: Optional[str] = "ckpt/Cnn14_16k_mAP=0.438.pth"
    vggish_checkpoint: Optional[str] = "ckpt/vggish.pth"
    clap_checkpoint: Optional[str] = "ckpt/music_audioset_epoch_15_esc_90.14.pt"
    target_length_centisec: int = 1000  # 10-s crops (eval.py WaveDataset)
    kid_subsets: int = 100

    def __post_init__(self):
        # eval-specific mel frontend: 512-point, fmin 50 (eval.py:90-93)
        self.eval_frontend = eval_mel_frontend()
        self._cnn14 = None
        self._vggish = None
        self._clap = None

    # -- backbones ----------------------------------------------------------

    def _get_cnn14(self):
        if self._cnn14 is None and self.cnn14_checkpoint and os.path.exists(
            self.cnn14_checkpoint
        ):
            import jax

            from consistencytta_tpu.evaluation.panns import Cnn14, convert_cnn14
            from consistencytta_tpu.io.torch_import import (
                assert_params_match,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(self.cnn14_checkpoint)
            sd = {k[len("model.") :] if k.startswith("model.") else k: v
                  for k, v in sd.items()}
            model = Cnn14()
            params = convert_cnn14(sd)
            expected = jax.eval_shape(
                lambda: model.init(
                    jax.random.PRNGKey(0), np.zeros((1, 32000), np.float32)
                )
            )["params"]
            assert_params_match(params, expected, self.cnn14_checkpoint)
            fn = jax.jit(lambda w: model.apply({"params": params}, w))
            self._cnn14 = fn
        return self._cnn14

    def cnn14_features(self, paths: List[str], batch: int = 8):
        fn = self._get_cnn14()
        if fn is None:
            return None
        # batch only equal-length clips: zero-padding a ragged batch adds
        # silent frames that shift the time max/mean pooling — the reference
        # runs batch 1 (eval.py:205-209), so features must be
        # length-faithful per clip. Results reassemble in input order.
        wavs = [load_wav_16k(p, self.target_length_centisec) for p in paths]
        buckets: Dict[int, List[int]] = {}
        for i, w in enumerate(wavs):
            buckets.setdefault(len(w), []).append(i)
        emb_out = [None] * len(paths)
        logit_out = [None] * len(paths)
        for _, idxs in sorted(buckets.items()):
            for start in range(0, len(idxs), batch):
                sel = idxs[start : start + batch]
                out = fn(np.stack([wavs[i] for i in sel]))
                e = np.asarray(out["2048"])
                l = np.asarray(out["logits"])
                for j, i in enumerate(sel):
                    emb_out[i] = e[j]
                    logit_out[i] = l[j]
        return np.stack(emb_out), np.stack(logit_out)

    # -- main ---------------------------------------------------------------

    def file_intersection(self, dir1: str, dir2: str, threshold: float = 0.99):
        names1 = {os.path.basename(p) for p in _list_wavs(dir1)}
        names2 = {os.path.basename(p) for p in _list_wavs(dir2)}
        inter = names1 & names2
        same = (
            len(inter) / max(len(names1), 1) > threshold
            and len(inter) / max(len(names2), 1) > threshold
        )
        return same, sorted(inter)

    def load_mel_artifact(self, mel_path: Optional[str]) -> Dict[str, np.ndarray]:
        """Load the all_mels.npz written by cli/inference.py (the reference's
        all_mels.pt artifact, inference.py:222-232) into a name->mel dict.
        Mels stored under a different crop length than this helper's are
        rejected (recompute instead) so a stale artifact can't skew PSNR/SSIM.
        """
        if not mel_path or not os.path.exists(mel_path):
            return {}
        with np.load(mel_path, allow_pickle=False) as z:
            if int(z["target_centisec"]) != self.target_length_centisec:
                print(
                    f"WARNING: {mel_path} stores mels cropped at "
                    f"{int(z['target_centisec'])} centisec, helper expects "
                    f"{self.target_length_centisec}; recomputing mels"
                )
                return {}
            names = [str(n) for n in z["names"]]
            return dict(zip(names, z["mels"]))

    def main(
        self,
        generated_dir: str,
        reference_dir: str,
        captions: Optional[Dict[str, str]] = None,
        limit_num: Optional[int] = None,
        mel_path: Optional[str] = None,
    ) -> Dict[str, float]:
        same_name, shared = self.file_intersection(generated_dir, reference_dir)
        if limit_num:
            shared = shared[:limit_num]
        stored_mels = self.load_mel_artifact(mel_path)

        gen_paths = (
            [os.path.join(generated_dir, n) for n in shared]
            if same_name
            else _list_wavs(generated_dir)
        )
        ref_paths = (
            [os.path.join(reference_dir, n) for n in shared]
            if same_name
            else _list_wavs(reference_dir)
        )

        out: Dict[str, float] = {}

        # paired waveform/mel metrics
        if same_name:
            lsd_vals, stft_ssim_vals, psnr_vals, ssim_vals = [], [], [], []
            for gp, rp in zip(gen_paths, ref_paths):
                # the paired metrics run on FULL uncropped files — the
                # reference MelPairedDataset never applies target_length
                # (load_mel.py:73-99; only the Cnn14/VGGish WaveDataset
                # crops) — and without the 2-s minimum pad
                wav_gen = load_wav_16k(gp, None, pad_to_2s=False)
                wav_ref = load_wav_16k(rp, None, pad_to_2s=False)
                r = M.log_spectral_distance(wav_gen, wav_ref, self.sampling_rate)
                lsd_vals.append(r["lsd"])
                stft_ssim_vals.append(r["ssim_stft"])

                mel_gen = stored_mels.get(os.path.basename(gp))
                if mel_gen is None:
                    mel_gen = normalized_logmel(wav_gen, self.eval_frontend)
                mel_ref = normalized_logmel(wav_ref, self.eval_frontend)
                n = min(len(mel_gen), len(mel_ref))
                p = M.psnr(mel_gen[:n], mel_ref[:n])
                if np.isfinite(p):
                    psnr_vals.append(p)
                ssim_vals.append(M.ssim(mel_gen[:n], mel_ref[:n], data_range=1.0))
            out["lsd"] = float(np.mean(lsd_vals))
            out["ssim_stft"] = float(np.mean(stft_ssim_vals))
            out["psnr"] = float(np.mean(psnr_vals)) if psnr_vals else float("nan")
            out["ssim"] = float(np.mean(ssim_vals))
        else:
            out.update({"lsd": -1, "ssim_stft": -1, "psnr": -1, "ssim": -1})

        # Cnn14-based distribution metrics
        gen_feats = self.cnn14_features(gen_paths)
        ref_feats = self.cnn14_features(ref_paths)
        if gen_feats is not None and ref_feats is not None:
            gen_emb, gen_logits = gen_feats
            ref_emb, ref_logits = ref_feats
            out["frechet_distance"] = M.frechet_distance(gen_emb, ref_emb)
            if same_name:
                out.update(M.kl_divergence_paired(gen_logits, ref_logits))
            out.update(M.inception_score(gen_logits))
            out.update(
                M.kernel_inception_distance(
                    gen_emb, ref_emb, subsets=self.kid_subsets,
                    subset_size=len(gen_paths),
                )
            )
        else:
            print("WARNING: Cnn14 checkpoint unavailable; FD/KL/ISc/KID skipped")

        # FAD (VGGish) — backbone port lands with its checkpoint importer
        from consistencytta_tpu.evaluation.vggish import vggish_embeddings

        vgg_gen = vggish_embeddings(gen_paths, self.vggish_checkpoint)
        vgg_ref = vggish_embeddings(ref_paths, self.vggish_checkpoint)
        if vgg_gen is not None and vgg_ref is not None:
            out["frechet_audio_distance"] = M.frechet_distance(vgg_gen, vgg_ref)
        else:
            print("WARNING: VGGish checkpoint unavailable; FAD skipped")

        # CLAP scores
        if captions is not None:
            from consistencytta_tpu.evaluation.clap import clap_embeddings

            emb = clap_embeddings(
                gen_paths, ref_paths,
                [captions.get(os.path.basename(p), "") for p in gen_paths],
                self.clap_checkpoint,
            )
            if emb is not None:
                out.update(M.clap_scores(emb["gt"], emb["gen"], emb["text"]))
            else:
                print("WARNING: CLAP checkpoint unavailable; CLAP scores skipped")

        result = {k: round(out.get(k, float("nan")), 4) for k in RESULT_KEYS}
        with open(generated_dir.rstrip("/") + "_evaluation_results.json", "w") as f:
            json.dump(result, f, indent=2)
        return result
