"""T5 prompt encoding (reference orv/models/text_encoder.py).

Thin wrapper over transformers' T5 encoder. Production datasets train with
`empty_prompt: true` and pre-encoded embeddings, so the live encoder is an
optional dependency: `t5_available()` gates it and callers fall back to
stored embeddings (orv_tpu.pipelines.encode_dataset writes the empty
embedding once).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import List, Optional

import numpy as np

DEFAULT_T5 = "google/t5-v1_1-xxl"  # CogVideoX text encoder


def t5_available(model_path: Optional[str] = None) -> bool:
    """True only for a local path with weights (zero-egress environments
    cannot download)."""
    return bool(model_path) and Path(str(model_path)).exists()


@lru_cache(maxsize=1)
def _load(model_path: str):
    from transformers import AutoTokenizer, FlaxT5EncoderModel

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    model = FlaxT5EncoderModel.from_pretrained(model_path, dtype="bfloat16")
    return tokenizer, model


def encode_prompts(
    prompts: List[str],
    max_sequence_length: int = 226,
    model_path: Optional[str] = None,
) -> np.ndarray:
    """-> [B, max_sequence_length, hidden] f32 (reference
    compute_prompt_embeddings: pad/truncate to 226, no attention-mask
    zeroing — CogVideoX uses the raw padded encoder states)."""
    if not t5_available(model_path):
        raise RuntimeError(
            "T5 weights unavailable; pass model_path to a local checkpoint "
            "or use pre-encoded prompt embeddings"
        )
    tokenizer, model = _load(str(model_path))
    batch = tokenizer(
        prompts, padding="max_length", max_length=max_sequence_length,
        truncation=True, add_special_tokens=True, return_tensors="np",
    )
    out = model(input_ids=batch["input_ids"]).last_hidden_state
    return np.asarray(out, dtype=np.float32)
