"""Batch collation (audiotools util.collate equivalent).

Stacks Signals into batched Signals (zero-padding to the longest clip),
numbers into arrays, recurses into dicts/lists.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..audio import Signal


def collate(list_of_dicts, n_splits: Optional[int] = None):
    batches = []
    list_len = len(list_of_dicts)
    return_list = n_splits is not None
    n_splits = 1 if n_splits is None else n_splits
    n_items = int(np.ceil(list_len / n_splits))

    for i in range(0, list_len, n_items):
        chunk = list_of_dicts[i : i + n_items]
        batches.append(_collate_one(chunk))
    return batches if return_list else batches[0]


def _collate_one(items):
    first = items[0]
    if isinstance(first, dict):
        return {k: _collate_one([it[k] for it in items]) for k in first}
    if isinstance(first, Signal):
        max_len = max(it.signal_length for it in items)
        batch = np.zeros(
            (len(items), first.num_channels, max_len), dtype=np.float32
        )
        for i, it in enumerate(items):
            data = np.asarray(it.audio_data)
            batch[i, :, : data.shape[-1]] = data[0]
        return Signal(batch, first.sample_rate, first.stft_params)
    if isinstance(first, (int, float, np.integer, np.floating)):
        return np.array(items)
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, (list, tuple)):
        return [ _collate_one([it[j] for it in items]) for j in range(len(first)) ]
    return items
