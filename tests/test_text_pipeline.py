"""Prompt -> embeddings stage (io/text.py) with a toy trained tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vorta_tpu.io.text import (
    encode_prompt_hunyuan,
    encode_prompt_wan,
    load_tokenizer,
    tokenize,
)
from vorta_tpu.models.text_encoders import (
    CLIP_TINY,
    CLIPTextEncoder,
    LLAMA_TINY,
    LlamaTextEncoder,
)
from vorta_tpu.models.umt5 import UMT5_TINY, UMT5Encoder


@pytest.fixture(scope="module")
def toy_tokenizer(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=100, special_tokens=["<pad>", "<unk>", "</s>"]
    )
    corpus = [
        "a cat walking on grass",
        "a dog running through a sunny field of flowers",
        "cinematic shot of a city at night",
    ]
    tok.train_from_iterator(corpus, trainer)
    d = tmp_path_factory.mktemp("tok")
    tok.save(str(d / "tokenizer.json"))
    return d


def test_load_and_tokenize(toy_tokenizer):
    tok = load_tokenizer(toy_tokenizer)
    ids, mask = tokenize(tok, "a cat walking", max_len=16)
    assert ids.shape == (1, 16) and mask.shape == (1, 16)
    n = int(mask.sum())
    assert 0 < n < 16
    assert np.all(np.asarray(ids)[0, n:] == 0)
    # batch form
    ids2, mask2 = tokenize(tok, ["a cat", "a dog running"], max_len=8)
    assert ids2.shape == (2, 8)
    assert int(mask2[1].sum()) >= int(mask2[0].sum())


def test_encode_prompt_wan(toy_tokenizer):
    tok = load_tokenizer(toy_tokenizer)
    enc = UMT5Encoder(UMT5_TINY, rngs=nnx.Rngs(0))
    states = encode_prompt_wan("a cat walking on grass", tok, enc, max_len=16)
    assert states.shape == (1, 16, UMT5_TINY.d_model)
    arr = np.asarray(states)
    assert np.isfinite(arr).all()
    # padded tail zeroed
    _, mask = tokenize(tok, "a cat walking on grass", 16)
    n = int(mask.sum())
    assert np.all(arr[0, n:] == 0)
    assert not np.all(arr[0, :n] == 0)


def test_encode_prompt_hunyuan(toy_tokenizer):
    tok = load_tokenizer(toy_tokenizer)
    llama = LlamaTextEncoder(LLAMA_TINY, rngs=nnx.Rngs(0))
    clip = CLIPTextEncoder(CLIP_TINY, rngs=nnx.Rngs(1))
    states, mask, pooled = encode_prompt_hunyuan(
        "a dog running", tok, llama, tok, clip, max_len=24, clip_max_len=12,
    )
    assert states.shape == (1, 24, LLAMA_TINY.dim)
    assert mask.shape == (1, 24)
    assert pooled.shape == (1, CLIP_TINY.dim)
    assert np.isfinite(np.asarray(states)).all()
    assert np.isfinite(np.asarray(pooled)).all()


def test_missing_tokenizer_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="tokenizer.json"):
        load_tokenizer(tmp_path)


def test_encode_prompt_hunyuan_template_cropped(toy_tokenizer):
    """The LLM template prefix must be cropped from the returned states and
    never reach CLIP (diffusers crop_start behavior)."""
    tok = load_tokenizer(toy_tokenizer)
    llama = LlamaTextEncoder(LLAMA_TINY, rngs=nnx.Rngs(0))
    clip = CLIPTextEncoder(CLIP_TINY, rngs=nnx.Rngs(1))
    template = "a city at night {}"
    states_t, mask_t, pooled_t = encode_prompt_hunyuan(
        "a dog running", tok, llama, tok, clip,
        max_len=24, clip_max_len=12, template=template,
    )
    # output length is the requested max_len, template tokens cropped away
    assert states_t.shape == (1, 24, LLAMA_TINY.dim)
    assert mask_t.shape == (1, 24)
    # CLIP pooled is computed from the RAW prompt: identical to no-template
    _, _, pooled_raw = encode_prompt_hunyuan(
        "a dog running", tok, llama, tok, clip, max_len=24, clip_max_len=12,
    )
    np.testing.assert_allclose(np.asarray(pooled_t), np.asarray(pooled_raw))
    # cropped mask counts only the user-prompt tokens
    n_user = int(tokenize(tok, "a dog running", 24)[1].sum())
    assert int(mask_t.sum()) == n_user
