"""Precomputed-latents dataset for router training.

Matches the reference's FastVideo-style layout
(vorta/dataset/latent_datasets.py): a JSON manifest next to ``latent/``,
``prompt_embed/`` and optional ``prompt_attention_mask/`` directories of
torch-saved tensors.  Training never touches the VAE or text encoder.

Differences from the reference, by design:
  * tensors come back channels-last (T, H, W, C) numpy, ready for the TPU
    model;
  * sequence-parallel distribution is NOT a dataloader concern — a global
    batch is laid out once with a NamedSharding (batch over dp, frames over
    sp) instead of the reference's all_to_all shuffle
    (vorta/dataset/utils.py:12-36).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np


def _load_tensor(path: Path) -> np.ndarray:
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    return t.float().numpy()


class LatentDataset:
    """items: dicts with keys latent_path, prompt_embed_path[, prompt_attention_mask]."""

    def __init__(
        self,
        manifest_path: str,
        num_latent_t: int,
        cfg_rate: float = 0.0,
        seed: int = 42,
    ):
        self.root = Path(manifest_path).parent
        with open(manifest_path) as f:
            self.items: List[dict] = json.load(f)
        self.num_latent_t = num_latent_t
        self.cfg_rate = cfg_rate
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        item = self.items[idx]
        latent = _load_tensor(self.root / "latent" / item["latent_path"])
        # stored (C, T, H, W); crop to the last num_latent_t frames
        # (reference: latent_datasets.py:70-75), emit channels-last
        latent = latent[:, -self.num_latent_t :]
        latent = np.transpose(latent, (1, 2, 3, 0))

        embed = _load_tensor(self.root / "prompt_embed" / item["prompt_embed_path"])
        mask = None
        if "prompt_attention_mask" in item:
            mask = _load_tensor(
                self.root / "prompt_attention_mask" / item["prompt_attention_mask"]
            )
        if self.cfg_rate > 0 and self._rng.random() < self.cfg_rate:
            embed = np.zeros_like(embed)
            if mask is not None:
                mask = np.concatenate(
                    [np.ones_like(mask[:1]), np.zeros_like(mask[1:])], axis=0
                )
        return latent, embed, mask

    @staticmethod
    def collate(samples):
        """Pad latents to the max (T, H, W) in the batch and stack."""
        latents = [s[0] for s in samples]
        t = max(x.shape[0] for x in latents)
        h = max(x.shape[1] for x in latents)
        w = max(x.shape[2] for x in latents)
        padded = np.stack(
            [
                np.pad(
                    x,
                    ((0, t - x.shape[0]), (0, h - x.shape[1]), (0, w - x.shape[2]), (0, 0)),
                )
                for x in latents
            ]
        )
        embeds = np.stack([s[1] for s in samples])
        masks = None
        if samples[0][2] is not None:
            masks = np.stack([s[2] for s in samples])
        return padded, embeds, masks


def epoch_iterator(
    dataset: LatentDataset,
    batch_size: int,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    """Infinite shuffled iterator of collated global batches."""
    epoch = 0
    while True:
        order = np.random.default_rng(seed + epoch).permutation(len(dataset))
        for start in range(0, len(order), batch_size):
            idx = order[start : start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            yield LatentDataset.collate([dataset[int(i)] for i in idx])
        epoch += 1
