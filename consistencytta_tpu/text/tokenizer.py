"""Prompt tokenization for the frozen text encoder.

The reference tokenizes with HF AutoTokenizer('google/flan-t5-large')
(models/audio_distilled_model.py:96-98). Here tokenization happens on the
host (outside the jitted graph) and always pads to a *fixed* length so text
batches have static shapes for XLA.

Two backends:
  * `HFTokenizer` — wraps the HF tokenizer when its files are available
    (from the hub cache or a local path).
  * `HashTokenizer` — a deterministic, dependency-free fallback that hashes
    whitespace tokens into the T5 vocab range. It is NOT lexically compatible
    with sentencepiece; it exists so development, tests, and benchmarks can
    run in hermetic environments. Real checkpoints require the HF tokenizer.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np

T5_EOS_ID = 1
T5_PAD_ID = 0


class HashTokenizer:
    """Deterministic stand-in tokenizer (see module docstring)."""

    def __init__(self, vocab_size: int = 32128, max_length: int = 512):
        self.vocab_size = vocab_size
        self.model_max_length = max_length

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
        # avoid pad/eos ids
        return 2 + (h % (self.vocab_size - 2))

    def __call__(
        self, prompts: Sequence[str], max_length: int, padding: str = "max_length"
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(prompts), max_length), T5_PAD_ID, np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for i, prompt in enumerate(prompts):
            toks = [self._word_id(w) for w in prompt.lower().split()][: max_length - 1]
            toks.append(T5_EOS_ID)
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


class HFTokenizer:
    """HF sentencepiece tokenizer wrapper with fixed-length padding."""

    def __init__(self, name_or_path: str = "google/flan-t5-large"):
        from transformers import AutoTokenizer

        try:
            # local cache / local path first: avoids minutes of network
            # retries in offline environments
            self.tok = AutoTokenizer.from_pretrained(
                name_or_path, local_files_only=True
            )
        except Exception:
            self.tok = AutoTokenizer.from_pretrained(name_or_path)
        self.model_max_length = self.tok.model_max_length

    def __call__(
        self, prompts: Sequence[str], max_length: int, padding: str = "max_length"
    ) -> Tuple[np.ndarray, np.ndarray]:
        batch = self.tok(
            list(prompts),
            max_length=max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        return (
            batch["input_ids"].astype(np.int32),
            batch["attention_mask"].astype(np.int32),
        )


def load_tokenizer(
    name_or_path: str = "google/flan-t5-large", vocab_size: int = 32128
):
    """HF tokenizer if its files resolve, else the hash fallback (bounded to
    `vocab_size` so ids stay inside the model's embedding table — JAX fills
    NaN on out-of-bounds gathers)."""
    try:
        return HFTokenizer(name_or_path)
    except Exception:
        return HashTokenizer(vocab_size=vocab_size)


ROBERTA_BOS_ID = 0
ROBERTA_PAD_ID = 1
ROBERTA_EOS_ID = 2


class HashClapTokenizer:
    """Offline stand-in for the RoBERTa tokenizer of the CLAP text branch
    (reference laion_clap/hook.py:64-72). Same interface as the HF
    tokenizer's dict-returning call so training.data.DataLoader can use
    either; hashes words into the RoBERTa vocab range with RoBERTa special
    ids (bos 0 / pad 1 / eos 2). NOT lexically compatible with BPE — real
    checkpoints require the HF tokenizer; this keeps stage-3 CLAP runs and
    tests working in hermetic environments."""

    def __init__(self, vocab_size: int = 50265):
        self.vocab_size = vocab_size

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
        return 3 + (h % (self.vocab_size - 3))

    def __call__(
        self,
        prompts: Sequence[str],
        padding: str = "max_length",
        truncation: bool = True,
        max_length: int = 77,
        return_tensors: str = "np",
    ) -> dict:
        ids = np.full((len(prompts), max_length), ROBERTA_PAD_ID, np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for i, prompt in enumerate(prompts):
            toks = [ROBERTA_BOS_ID]
            toks += [self._word_id(w) for w in prompt.lower().split()][
                : max_length - 2
            ]
            toks.append(ROBERTA_EOS_ID)
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def load_clap_tokenizer(vocab_size: int = 50265):
    """RoBERTa tokenizer for the CLAP text tower, with the hermetic hash
    fallback — never returns None (a silent None used to surface later as a
    bare KeyError('clap_text_ids') inside the jitted stage-3 step)."""
    import os

    tok = None
    try:
        from transformers import AutoTokenizer

        try:
            tok = AutoTokenizer.from_pretrained(
                "roberta-base", local_files_only=True
            )
        except Exception:
            # only attempt the hub when the environment allows egress —
            # on the zero-egress box a network try burns ~45 s of DNS
            # retries per call before the hash fallback kicks in
            if os.environ.get("HF_HUB_OFFLINE", "0") == "1" or os.environ.get(
                "TRANSFORMERS_OFFLINE", "0"
            ) == "1":
                tok = None
            else:
                tok = AutoTokenizer.from_pretrained("roberta-base")
    except Exception:
        tok = None
    # a real tokenizer emitting ids beyond the text tower's embedding table
    # (tiny test checkpoints) would NaN on the gather — hash-bound instead
    if tok is not None and getattr(tok, "vocab_size", 0) <= vocab_size:
        return tok
    return HashClapTokenizer(vocab_size=vocab_size)


def tokenize_with_uncond(
    tokenizer, prompts: Sequence[str], max_length: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize prompts plus the empty-string unconditional batch used for
    classifier-free guidance (audio_distilled_model.py:229-232: uncond
    tokens are "" padded to the conditional length)."""
    ids, mask = tokenizer(prompts, max_length)
    uncond_ids, uncond_mask = tokenizer([""] * len(prompts), max_length)
    return ids, mask, uncond_ids, uncond_mask
