"""CLAP embedding extraction for the evaluation harness.

The CLAP towers (HTSAT-base audio encoder + RoBERTa text encoder) live in
consistencytta_tpu.evaluation.clap_model; this module wires them to the
harness protocol (audioldm_eval/eval.py:30-56): 48 kHz audio features with
deterministic truncation (the reference re-seeds before every call),
RoBERTa-tokenized captions, L2-normalized projected embeddings.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def clap_embeddings(
    gen_paths: List[str],
    ref_paths: List[str],
    captions: List[str],
    checkpoint: Optional[str],
) -> Optional[Dict[str, np.ndarray]]:
    """Returns {"gen": [N,512], "gt": [N,512], "text": [N,512]} or None when
    the checkpoint (or tokenizer assets) are unavailable."""
    if not checkpoint or not os.path.exists(checkpoint):
        return None

    try:
        from consistencytta_tpu.evaluation.clap_model import CLAPWrapper
    except ImportError:
        return None

    wrapper = CLAPWrapper.from_checkpoint(checkpoint)
    if wrapper is None:
        return None
    gen = wrapper.audio_embeddings(gen_paths)
    gt = wrapper.audio_embeddings(ref_paths)
    text = wrapper.text_embeddings(captions)
    return {"gen": gen, "gt": gt, "text": text}
