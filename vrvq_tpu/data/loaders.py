"""Dataset / loader pipeline: deterministic idx-seeded audio excerpting.

Reference: data/loaders.py. Semantics preserved:

  * ``AudioLoader`` scans source dirs into a flat (source, item) index with
    deterministic shuffle; drawing an item takes a salient excerpt at a
    loudness cutoff and silently falls back to zeros on failure
    (data/loaders.py:77-100 — data-level fault tolerance).
  * ``AudioDataset.__getitem__`` seeds a RandomState with the idx so every
    sample is reproducible; ``without_replacement`` maps idx -> global item
    (data/loaders.py:172-187).
  * ``ConcatDataset`` round-robins sub-datasets by ``idx % n``.

The collate produces fixed-shape numpy batches ready to feed the jit'd
train step (static shapes; no torch DataLoader — a thread pool prefetches
batches host-side, see vrvq_tpu/train/loop.py).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Union

import numpy as np

from ..audio import Signal
from .audio_io import choose_from_list_of_lists, read_sources, AUDIO_EXTENSIONS


def _random_state(seed_or_state):
    if isinstance(seed_or_state, np.random.RandomState):
        return seed_or_state
    return np.random.RandomState(seed_or_state)


class AudioLoader:
    """Reference: data/loaders.py:17-126."""

    def __init__(
        self,
        sources: Optional[List[str]] = None,
        weights: Optional[List[float]] = None,
        transform: Optional[Callable] = None,
        relative_path: str = "",
        ext: Optional[List[str]] = None,
        shuffle: bool = True,
        shuffle_state: int = 0,
    ):
        self.audio_lists = read_sources(
            sources or [], relative_path=relative_path,
            ext=ext or AUDIO_EXTENSIONS,
        )
        self.audio_indices = [
            (src_idx, item_idx)
            for src_idx, src in enumerate(self.audio_lists)
            for item_idx in range(len(src))
        ]
        if shuffle:
            state = _random_state(shuffle_state)
            state.shuffle(self.audio_indices)

        self.sources = sources or []
        self.weights = weights
        self.transform = transform

    def __call__(
        self,
        state,
        sample_rate: int,
        duration: float,
        loudness_cutoff: float = -40,
        num_channels: int = 1,
        offset: Optional[float] = None,
        source_idx: Optional[int] = None,
        item_idx: Optional[int] = None,
        global_idx: Optional[int] = None,
    ) -> Dict:
        state = _random_state(state)
        if source_idx is not None and item_idx is not None:
            try:
                audio_info = self.audio_lists[source_idx][item_idx]
            except (IndexError, KeyError):
                audio_info = {"path": "none"}
        elif global_idx is not None:
            source_idx, item_idx = self.audio_indices[
                global_idx % len(self.audio_indices)
            ]
            audio_info = self.audio_lists[source_idx][item_idx]
        else:
            audio_info, source_idx, item_idx = choose_from_list_of_lists(
                state, self.audio_lists, p=self.weights
            )

        path = audio_info["path"]
        signal = Signal.zeros(duration, sample_rate, num_channels)

        if path != "none":
            try:
                if offset is None:
                    if duration is not None:
                        signal = Signal.salient_excerpt(
                            path,
                            duration=duration,
                            state=state,
                            loudness_cutoff=loudness_cutoff,
                        )
                    else:
                        signal = Signal.load(path, offset=0)
                else:
                    signal = Signal.load(path, offset=offset, duration=duration)
            except Exception:
                # corrupt / unreadable files silently become silence
                # (reference data/loaders.py:86-100)
                signal = Signal.zeros(duration, sample_rate, num_channels)

        if num_channels == 1:
            signal = signal.to_mono()
        signal = signal.resample(sample_rate)

        if duration is not None and signal.signal_length < int(duration * sample_rate):
            signal = signal.zero_pad_to(int(duration * sample_rate))
        if duration is not None:
            signal = signal.truncate_samples(int(duration * sample_rate))

        for k, v in audio_info.items():
            signal.metadata[k] = v

        item = {
            "signal": signal,
            "source_idx": source_idx,
            "item_idx": item_idx,
            "source": str(self.sources[source_idx]) if self.sources else "",
            "path": str(path),
        }
        if self.transform is not None:
            item["transform_args"] = self.transform.instantiate(state, signal=signal)
        return item


class AudioDataset:
    """Reference: data/loaders.py:130-247."""

    def __init__(
        self,
        loaders: Union[AudioLoader, List[AudioLoader], Dict[str, AudioLoader]],
        sample_rate: int,
        n_examples: int = 1000,
        duration: float = 0.5,
        offset: Optional[float] = None,
        loudness_cutoff: float = -40,
        num_channels: int = 1,
        transform: Optional[Callable] = None,
        aligned: bool = False,
        shuffle_loaders: bool = False,
        without_replacement: bool = True,
    ):
        if isinstance(loaders, list):
            loaders = {i: l for i, l in enumerate(loaders)}
        elif isinstance(loaders, AudioLoader):
            loaders = {0: loaders}

        self.loaders = loaders
        self.loudness_cutoff = loudness_cutoff
        self.num_channels = num_channels
        self.length = n_examples
        self.transform = transform
        self.sample_rate = sample_rate
        self.duration = duration
        self.offset = offset
        self.aligned = aligned
        self.shuffle_loaders = shuffle_loaders
        self.without_replacement = without_replacement

    def __getitem__(self, idx: int) -> Dict:
        state = _random_state(idx)
        item = {}
        keys = list(self.loaders.keys())
        if self.shuffle_loaders:
            state.shuffle(keys)

        loader_kwargs = {
            "state": state,
            "sample_rate": self.sample_rate,
            "duration": self.duration,
            "loudness_cutoff": self.loudness_cutoff,
            "num_channels": self.num_channels,
            "global_idx": idx if self.without_replacement else None,
            "offset": self.offset,
        }

        loader = self.loaders[keys[0]]
        item[keys[0]] = loader(**loader_kwargs)

        for key in keys[1:]:
            loader = self.loaders[key]
            if self.aligned:
                loader_kwargs.update(
                    {
                        "offset": item[keys[0]]["signal"].metadata.get("offset"),
                        "source_idx": item[keys[0]]["source_idx"],
                        "item_idx": item[keys[0]]["item_idx"],
                    }
                )
            item[key] = loader(**loader_kwargs)

        keys = list(self.loaders.keys())
        item = {k: item[k] for k in keys}
        item["idx"] = idx
        if self.transform is not None:
            item["transform_args"] = self.transform.instantiate(
                state=state, signal=item[keys[0]]["signal"]
            )
        if len(keys) == 1:
            item.update(item.pop(keys[0]))
        return item

    def __len__(self) -> int:
        return self.length

    @staticmethod
    def collate(list_of_dicts, n_splits: Optional[int] = None):
        """Batch Signals into (B, C, T) arrays; dicts recursively."""
        from .collate import collate

        return collate(list_of_dicts, n_splits=n_splits)


class ConcatDataset(AudioDataset):
    """Round-robin over datasets by idx (reference: data/loaders.py:250-259)."""

    def __init__(self, datasets: list):
        self.datasets = datasets

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx: int):
        dataset = self.datasets[idx % len(self.datasets)]
        return dataset[idx // len(self.datasets)]
