"""Text conditioner (reference models/conditioner/text.py:8-38).

The reference encodes tokenized captions with a CLIP text tower into
[B, 1, D] conditioning (its text-conditioned model was never released —
README.md:50-58). Here the tower is a native flax CLIPTextTower
(conditioner/clip.py) loaded from a local transformers CLIPTextModel
checkpoint; a deterministic hash-embedding stub keeps pipelines runnable
when no weights/tokenizer are supplied (zero-egress sandbox).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class CLIPTextEncoder:
    """flax CLIP text tower -> pooled [B, 1, D] conditioning
    (reference text.py:24-38 contract: one token per caption)."""

    def __init__(self, tower=None, params=None, tokenizer=None,
                 model_name_or_path: str | None = None):
        from .clip import CLIPTextTower, convert_clip_text

        if model_name_or_path:
            import torch  # local checkpoint only; no hub download

            from transformers import CLIPTextModel, CLIPTokenizerFast

            tm = CLIPTextModel.from_pretrained(model_name_or_path)
            cfg = tm.config
            tower = CLIPTextTower(
                vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                num_layers=cfg.num_hidden_layers,
                num_heads=cfg.num_attention_heads,
                mlp_dim=cfg.intermediate_size,
                max_positions=cfg.max_position_embeddings,
                eos_token_id=cfg.eos_token_id,
            )
            params = convert_clip_text(tm.state_dict(),
                                       num_layers=cfg.num_hidden_layers)
            if tokenizer is None:
                tokenizer = CLIPTokenizerFast.from_pretrained(
                    model_name_or_path)
            del torch
        self.tower = tower
        self.params = params
        self.tokenizer = tokenizer

    def encode_ids(self, input_ids) -> jnp.ndarray:
        out = self.tower.apply(self.params,
                               jnp.asarray(np.asarray(input_ids, np.int32)))
        return out["pooled"][:, None, :]

    def __call__(self, texts) -> jnp.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "CLIPTextEncoder needs a tokenizer (pass tokenizer= or "
                "model_name_or_path= pointing at local CLIP files)")
        ids = self.tokenizer(list(texts), padding="max_length",
                             truncation=True, return_tensors="np")
        return self.encode_ids(ids["input_ids"])


class TextConditioner:
    """Reference text.py:8-38 contract. A real CLIP encoder is required
    unless the config opts into the deterministic hash-embedding stub
    with ``stub: true`` — a silent fallback would let a config that
    *claims* CLIP text conditioning run on garbage embeddings."""

    def __init__(self, encoder=None, dim: int = 768, stub: bool = False):
        self.dim = dim
        self._encoder = encoder
        self._stub = bool(stub)
        if encoder is None and not self._stub:
            raise ValueError(
                "TextConditioner has no encoder: pass encoder= (a "
                "CLIPTextEncoder with local weights) or opt into the "
                "hash-embedding stub explicitly with stub=True "
                "(`stub: true` in config)")

    def _stub_embed(self, texts):
        out = []
        for t in texts:
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            out.append(rng.standard_normal(self.dim).astype(np.float32))
        return np.stack(out)[:, None, :]

    def __call__(self, texts):
        if self._encoder is not None:
            return self._encoder(texts)
        return self._stub_embed(list(texts))
