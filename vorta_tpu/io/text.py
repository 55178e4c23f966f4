"""Prompt -> conditioning embeddings (on-the-fly text encoding).

The reference encodes prompts inside the diffusers pipeline (UMT5 for Wan —
pipeline_wan.py:267-276; Llama hidden states + CLIP pooled for Hunyuan).
This module is the host-side half of that stage: HuggingFace *fast*
tokenizers (the Rust `tokenizers` runtime, no sentencepiece needed when a
``tokenizer.json`` is present) feeding the native NNX encoders
(models/umt5.py, models/text_encoders.py).

Weights/tokenizer files are not present in this environment; callers pass
directories containing ``tokenizer.json`` (+ encoder checkpoints loaded
separately through io/torch_import).  Everything is exercised in tests with
a toy trained tokenizer and the tiny encoder configs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def load_tokenizer(path):
    """Load a fast tokenizer from a directory (tokenizer.json) or file."""
    from tokenizers import Tokenizer

    p = Path(path)
    if p.is_dir():
        p = p / "tokenizer.json"
    if not p.exists():
        raise FileNotFoundError(
            f"{p} not found — need a HuggingFace fast-tokenizer file "
            "(tokenizer.json; the slow sentencepiece format is not supported "
            "in this environment)"
        )
    return Tokenizer.from_file(str(p))


def tokenize(tokenizer, prompts, max_len: int, pad_id: int = 0):
    """-> (ids (B, L) int32, mask (B, L) bool), padded/truncated to max_len."""
    if isinstance(prompts, str):
        prompts = [prompts]
    ids = np.full((len(prompts), max_len), pad_id, np.int32)
    mask = np.zeros((len(prompts), max_len), bool)
    for i, prompt in enumerate(prompts):
        enc = tokenizer.encode(prompt)
        toks = enc.ids[:max_len]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = True
    return jnp.asarray(ids), jnp.asarray(mask)


def encode_prompt_wan(
    prompts,
    tokenizer,
    encoder,  # models.umt5.UMT5Encoder
    max_len: int = 512,
) -> jnp.ndarray:
    """Prompt(s) -> (B, max_len, text_dim) UMT5 hidden states, zero-padded
    (the reference trains/runs Wan without an attention mask on the text —
    padded positions carry zeros: latent_datasets.py:45-60)."""
    ids, mask = tokenize(tokenizer, prompts, max_len)
    states = encoder(ids, mask)
    return states * mask[:, :, None].astype(states.dtype)


def encode_prompt_hunyuan(
    prompts,
    llama_tokenizer,
    llama_encoder,  # models.text_encoders.LlamaTextEncoder
    clip_tokenizer,
    clip_encoder,  # models.text_encoders.CLIPTextEncoder
    max_len: int = 256,
    clip_max_len: int = 77,
    template: Optional[str] = None,
    crop_start: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prompt(s) -> (llama hidden states (B, max_len, D), mask (B, max_len),
    CLIP pooled (B, Dp)) — the Hunyuan conditioning triple.

    With a ``template`` (the LLM instruction prompt HunyuanVideo wraps user
    prompts in), only the LLAMA input is templated; the template-prefix
    tokens are tokenized with extra budget and CROPPED from the returned
    hidden states/mask (diffusers' crop_start), and CLIP sees the RAW user
    prompt — matching the reference pipeline's conditioning."""
    raw_prompts = prompts
    if template is not None:
        if crop_start is None:
            # tokens the template contributes before the user prompt
            crop_start = len(llama_tokenizer.encode(template.format("")).ids)
        if isinstance(prompts, str):
            prompts = template.format(prompts)
        else:
            prompts = [template.format(p) for p in prompts]
    else:
        crop_start = 0
    ids, mask = tokenize(llama_tokenizer, prompts, max_len + crop_start)
    states = llama_encoder(ids, mask, crop_start=crop_start)
    mask = mask[:, crop_start:]
    cids, _ = tokenize(clip_tokenizer, raw_prompts, clip_max_len)
    pooled = clip_encoder(cids)
    return states, mask, pooled
