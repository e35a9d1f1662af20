"""GloVe embedding loading for the Follower encoder.

The reference supports initializing the instruction encoder from a
precomputed GloVe table (`tasks/R2R-judy/src/utils/config.py:70`
MODEL.FOLLOWER.GLOVE_PATH, consumed at `src/model/units.py:30-37`).
Supports both the `.npy` matrix format (already vocab-aligned) and raw
GloVe text files (word <space> floats), aligned against a vocab with
N(0, 0.1) fallback rows for missing words.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def load_glove(path: str, vocab: Optional[List[str]] = None, dim: int = 300,
               seed: int = 0) -> np.ndarray:
    if path.endswith(".npy"):
        table = np.load(path).astype(np.float32)
        if vocab is not None and table.shape[0] != len(vocab):
            raise ValueError(f"GloVe rows {table.shape[0]} != vocab {len(vocab)}")
        return table
    assert vocab is not None, "text-format GloVe requires a vocab to align against"
    rng = np.random.default_rng(seed)
    table = rng.normal(0.0, 0.1, (len(vocab), dim)).astype(np.float32)
    index = {w: i for i, w in enumerate(vocab)}
    hits = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) != dim + 1:
                continue
            w = parts[0]
            if w in index:
                table[index[w]] = np.asarray(parts[1:], dtype=np.float32)
                hits += 1
    table[0] = 0.0  # <PAD>
    return table
