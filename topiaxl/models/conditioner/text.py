"""Text conditioner (reference models/conditioner/text.py:8-38).

The reference path encodes tokenized captions with an open_clip text
tower into [B, 1, D] conditioning. open_clip isn't available here; this
wrapper targets the same contract with a pluggable encoder: a
transformers CLIP text model when present, else a hash-embedding stub so
pipelines remain runnable (the released 3DTopia-XL model is image-
conditioned; text is scaffolding upstream too — README.md:50-58).
"""

from __future__ import annotations

import numpy as np


class TextConditioner:
    def __init__(self, encoder=None, dim: int = 768):
        self.dim = dim
        self._encoder = encoder

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
