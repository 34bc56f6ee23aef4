"""AudioCaps data pipeline: json manifests -> fixed-shape numpy batches.

Replaces the reference's HF-datasets + torch DataLoader stack
(tools/t2a_dataset.py): the same json manifests (columns `captions` /
`location` by default, train.sh --text_column --audio_column), the same
waveform preprocessing (io/audio.read_wav_file), the same loudness-matched
mix augmentation (tools/mix.py, tools/torch_tools.py:92-123), but emitting
numpy batches with static shapes ready for `device_put` onto the data mesh
axis. Tokenization happens here (host) so the device graph stays static.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from consistencytta_tpu.io.audio import read_wav_file
from consistencytta_tpu.text.tokenizer import tokenize_with_uncond


def a_weight(fs: int, n_fft: int, min_db: float = -80.0) -> np.ndarray:
    """IEC A-weighting curve in dB over rfft bins (tools/mix.py:4-15)."""
    freq = np.linspace(0, fs // 2, n_fft // 2 + 1)
    freq_sq = np.power(freq, 2)
    freq_sq[0] = 1.0
    weight = 2.0 + 20.0 * (
        2 * np.log10(12194)
        + 2 * np.log10(freq_sq)
        - np.log10(freq_sq + 12194**2)
        - np.log10(freq_sq + 20.6**2)
        - 0.5 * np.log10(freq_sq + 107.7**2)
        - 0.5 * np.log10(freq_sq + 737.9**2)
    )
    return np.maximum(weight, min_db)


def compute_gain_db(sound: np.ndarray, fs: int, min_db: float = -80.0) -> np.ndarray:
    """Max A-weighted frame energy in dB (tools/mix.py:18-43)."""
    if fs == 16000:
        n_fft = 2048
    elif fs == 44100:
        n_fft = 4096
    else:
        raise ValueError(f"invalid fs {fs}")
    stride = n_fft // 2
    aw = np.power(10, a_weight(fs, n_fft) / 10)
    window = np.hanning(n_fft + 1)[:-1]

    gains = []
    for i in range(0, len(sound) - n_fft + 1, stride):
        spec = np.fft.rfft(window * sound[i : i + n_fft])
        gains.append(np.sum(np.abs(spec) ** 2 * aw))
    g = np.maximum(np.array(gains), np.power(10, min_db / 10))
    return 10 * np.log10(g)


def mix_sounds(s1: np.ndarray, s2: np.ndarray, r: float, fs: int) -> np.ndarray:
    """Loudness-matched mixing (tools/mix.py:46-51)."""
    g1 = np.max(compute_gain_db(s1, fs))
    g2 = np.max(compute_gain_db(s2, fs))
    t = 1.0 / (1 + np.power(10, (g1 - g2) / 20.0) * (1 - r) / r)
    return (s1 * t + s2 * (1 - t)) / np.sqrt(t**2 + (1 - t) ** 2)


def _uncapitalize(s: str) -> str:
    return s[:1].lower() + s[1:] if s else ""


def augment_batch(
    waveforms: np.ndarray,
    texts: Sequence[str],
    num_items: Optional[int] = None,
    sr: int = 16000,
    rng: Optional[random.Random] = None,
):
    """Pairwise mix augmentation (tools/torch_tools.py:98-123): mixes up to
    len(texts)//2 random caption pairs, 'A and b' captions, renormalized."""
    rng = rng or random
    if num_items is None:
        num_items = len(texts) // 2
    import itertools

    combos = list(itertools.combinations(range(len(texts)), 2))
    rng.shuffle(combos)
    combos = combos[:num_items]

    mixed_wavs, mixed_caps = [], []
    for i, j in combos:
        mixed_wavs.append(mix_sounds(waveforms[i], waveforms[j], 0.5, sr))
        mixed_caps.append(f"{texts[i]} and {_uncapitalize(texts[j])}")
    if not mixed_wavs:
        return np.zeros((0, waveforms.shape[1]), np.float32), []
    mixed = np.stack(mixed_wavs)
    mixed = mixed / np.abs(mixed).max() / 2.0
    return mixed.astype(np.float32), mixed_caps


@dataclass
class T2ADataset:
    """Text-audio pairs from a json manifest.

    Manifest format (reference data/*.json): {"data": [{...}]} or jsonl,
    each row carrying the caption and wav-path columns."""

    captions: List[str]
    paths: List[str]
    segment_length: int = 1024 * 160
    target_sr: int = 16000

    @classmethod
    def from_json(
        cls,
        path: str,
        text_column: str = "captions",
        audio_column: str = "location",
        num_examples: int = -1,
        prefix: Optional[str] = None,
        **kwargs,
    ) -> "T2ADataset":
        """`prefix` is prepended to every caption (the reference --prefix,
        tools/t2a_dataset.py:22-23)."""
        rows: List[dict] = []
        with open(path) as f:
            first = f.read(1)
            f.seek(0)
            if first == "{":
                try:
                    obj = json.load(f)
                    if isinstance(obj, dict):
                        # {"data": [...]} manifest, or a single jsonl row
                        rows = obj["data"] if "data" in obj else [obj]
                    else:
                        rows = obj
                except json.JSONDecodeError:
                    f.seek(0)
                    rows = [json.loads(line) for line in f if line.strip()]
            else:
                rows = [json.loads(line) for line in f if line.strip()]
        if num_examples > 0:
            rows = rows[:num_examples]
        return cls(
            captions=[(prefix or "") + r[text_column] for r in rows],
            paths=[r[audio_column] for r in rows],
            **kwargs,
        )

    def __len__(self) -> int:
        return len(self.captions)

    def shard(self, process_index: int, process_count: int) -> "T2ADataset":
        """Disjoint per-host slice for multi-host training: host k reads
        rows k, k+P, k+2P, ... and feeds them through
        parallel.mesh.make_global_batch_from_local (the reference's
        per-rank Accelerate DataLoader split, SURVEY.md section 2.9)."""
        return T2ADataset(
            captions=self.captions[process_index::process_count],
            paths=self.paths[process_index::process_count],
            segment_length=self.segment_length,
            target_sr=self.target_sr,
        )

    def load_item(self, idx: int):
        wav = read_wav_file(self.paths[idx], self.segment_length, self.target_sr)
        return self.captions[idx], wav


@dataclass
class DataLoader:
    """Batched iterator with optional mix augmentation and tokenization.

    Batches always have the exact requested size (static shapes for jit):
    the final short batch of an epoch is dropped, like the reference's
    drop_last-by-accumulation behavior."""

    dataset: T2ADataset
    tokenizer: object
    batch_size: int
    text_len: int = 64
    augment: bool = False
    shuffle: bool = True
    seed: int = 0
    # stage-3: RoBERTa tokenizer for the CLAP loss captions (max_len 77,
    # laion_clap hook.py tokenization); emits clap_text_ids/clap_text_mask
    clap_tokenizer: object = None
    clap_text_len: int = 77

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        rng = random.Random(self.seed)
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)

        # with augmentation, each batch = originals + mixtures; draw fewer
        # originals so the emitted batch size stays fixed
        n_orig = self.batch_size
        if self.augment:
            n_orig = (self.batch_size * 2 + 2) // 3  # orig + orig//2 >= bs

        for start in range(0, len(order) - n_orig + 1, n_orig):
            idxs = order[start : start + n_orig]
            caps, wavs = [], []
            for i in idxs:
                c, w = self.dataset.load_item(int(i))
                caps.append(c)
                wavs.append(w)
            wav = np.stack(wavs)

            if self.augment:
                mixed, mixed_caps = augment_batch(wav, caps, rng=rng)
                wav = np.concatenate([wav, mixed], axis=0)[: self.batch_size]
                caps = (caps + mixed_caps)[: self.batch_size]
                if wav.shape[0] < self.batch_size:
                    continue

            ids, mask, uids, umask = tokenize_with_uncond(
                self.tokenizer, caps, self.text_len
            )
            batch = {
                "wav": wav.astype(np.float32),
                "ids": ids,
                "mask": mask,
                "uncond_ids": uids,
                "uncond_mask": umask,
                "captions": caps,
            }
            if self.clap_tokenizer is not None:
                enc = self.clap_tokenizer(
                    caps, padding="max_length", truncation=True,
                    max_length=self.clap_text_len, return_tensors="np",
                )
                batch["clap_text_ids"] = enc["input_ids"].astype(np.int32)
                batch["clap_text_mask"] = enc["attention_mask"].astype(np.int32)
            yield batch
