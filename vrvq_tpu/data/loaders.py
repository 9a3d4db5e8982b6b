"""Dataset / loader pipeline: deterministic idx-seeded audio excerpting.

Behavioral spec (reference: data/loaders.py, itself derived from
MIT-licensed descript-audiotools):

  * ``AudioLoader`` scans source dirs into per-source lists plus a flat
    deterministic-shuffled (source, item) index; drawing an item takes a
    salient excerpt above a loudness cutoff; unreadable files degrade to
    silence (data-level fault tolerance) — here with a warn-once so a
    broken dataset can't silently train on zeros.
  * ``AudioDataset.__getitem__`` seeds a RandomState with the idx so
    every sample is reproducible; ``without_replacement`` maps
    idx -> global item; ``aligned`` datasets align their loaders' file
    lists at init via ``matcher``/``align_lists`` and then share
    offset/source/item across loaders at get-time.
  * ``ConcatDataset`` round-robins sub-datasets by ``idx % n``.

The collate produces fixed-shape numpy batches ready to feed the jit'd
train step (static shapes; no torch DataLoader — a thread pool prefetches
batches host-side, see vrvq_tpu/train/loop.py).
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import numpy as np

from ..audio import Signal
from .audio_io import choose_from_list_of_lists, read_sources, AUDIO_EXTENSIONS

_NONE_ITEM = {"path": "none"}


def _random_state(seed_or_state):
    if isinstance(seed_or_state, np.random.RandomState):
        return seed_or_state
    return np.random.RandomState(seed_or_state)


_WARNED_PATHS: set = set()


def _warn_once(path, exc: Exception) -> None:
    """Loud (but once-per-path) report before degrading to silence."""
    key = str(path)
    if key in _WARNED_PATHS:
        return
    _WARNED_PATHS.add(key)
    warnings.warn(
        f"could not load audio file {path!r} ({type(exc).__name__}: {exc}); "
        "substituting silence for every draw of this file",
        RuntimeWarning,
        stacklevel=3,
    )


# --------------------------------------------------------------- alignment
def default_matcher(x, y) -> bool:
    """Two paths 'match' when they live in sibling positions: same parent
    directory name (audiotools convention for aligned datasets)."""
    return Path(x).parent.name == Path(y).parent.name


def align_lists(lists: List[List[Dict]], matcher: Callable = default_matcher):
    """Pad per-loader file lists so index i refers to matching items in
    every list, inserting ``{"path": "none"}`` placeholders where a list
    has no counterpart (reference data/loaders.py:165-170 semantics)."""
    longest = max(lists, key=len)
    for i, anchor in enumerate(longest):
        for lst in lists:
            if i >= len(lst):
                lst.append(dict(_NONE_ITEM))
            elif lst[i]["path"] != "none" and not matcher(
                lst[i]["path"], anchor["path"]
            ):
                lst.insert(i, dict(_NONE_ITEM))
    return lists


# ------------------------------------------------------------------ loader
class AudioLoader:
    """Scans sources and draws reproducible excerpts.

    Behavioral spec: reference data/loaders.py:17-126.
    """

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
        self.sources = sources or []
        self.weights = weights
        self.transform = transform
        self.audio_lists = read_sources(
            self.sources, relative_path=relative_path,
            ext=ext or AUDIO_EXTENSIONS,
        )
        self.audio_indices = self._flat_index(shuffle, shuffle_state)

    def _flat_index(self, shuffle: bool, shuffle_state: int):
        index = [
            (s, i)
            for s, src in enumerate(self.audio_lists)
            for i in range(len(src))
        ]
        if shuffle:
            _random_state(shuffle_state).shuffle(index)
        return index

    # -- item resolution ---------------------------------------------------
    def _resolve(self, state, source_idx, item_idx, global_idx):
        """Pick (audio_info, source_idx, item_idx) by explicit address,
        global index, or weighted random draw."""
        if source_idx is not None and item_idx is not None:
            try:
                return self.audio_lists[source_idx][item_idx], source_idx, item_idx
            except (IndexError, KeyError):
                return dict(_NONE_ITEM), source_idx, item_idx
        if global_idx is not None:
            s, i = self.audio_indices[global_idx % len(self.audio_indices)]
            return self.audio_lists[s][i], s, i
        return choose_from_list_of_lists(state, self.audio_lists, p=self.weights)

    # -- signal loading ----------------------------------------------------
    def _load(self, path, state, sample_rate, duration, loudness_cutoff,
              num_channels, offset) -> Signal:
        if path == "none":
            return Signal.zeros(duration, sample_rate, num_channels)
        try:
            if offset is not None:
                return Signal.load(path, offset=offset, duration=duration)
            if duration is None:
                return Signal.load(path, offset=0)
            return Signal.salient_excerpt(
                path, duration=duration, state=state,
                loudness_cutoff=loudness_cutoff,
            )
        except Exception as exc:
            # fault tolerance: unreadable files degrade to silence, but
            # loudly (reference degraded silently: data/loaders.py:86-100)
            _warn_once(path, exc)
            return Signal.zeros(duration, sample_rate, num_channels)

    @staticmethod
    def _conform(signal: Signal, sample_rate, duration, num_channels) -> Signal:
        if num_channels == 1:
            signal = signal.to_mono()
        signal = signal.resample(sample_rate)
        if duration is not None:
            want = int(duration * sample_rate)
            if signal.signal_length < want:
                signal = signal.zero_pad_to(want)
            signal = signal.truncate_samples(want)
        return signal

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
        audio_info, source_idx, item_idx = self._resolve(
            state, source_idx, item_idx, global_idx
        )
        path = audio_info["path"]
        signal = self._conform(
            self._load(path, state, sample_rate, duration, loudness_cutoff,
                       num_channels, offset),
            sample_rate, duration, num_channels,
        )
        signal.metadata.update(audio_info)

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


# ----------------------------------------------------------------- dataset
class AudioDataset:
    """Reproducible multi-loader dataset.

    Behavioral spec: reference data/loaders.py:130-247, including
    init-time list alignment for ``aligned=True`` (matcher/align_lists).
    """

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
        matcher: Callable = default_matcher,
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

        if aligned:
            loaders_list = list(loaders.values())
            for i in range(len(loaders_list[0].audio_lists)):
                # alignment happens in place on the per-source lists
                align_lists([l.audio_lists[i] for l in loaders_list], matcher)

    def _draw_kwargs(self, state, idx) -> Dict:
        return {
            "state": state,
            "sample_rate": self.sample_rate,
            "duration": self.duration,
            "loudness_cutoff": self.loudness_cutoff,
            "num_channels": self.num_channels,
            "global_idx": idx if self.without_replacement else None,
            "offset": self.offset,
        }

    def __getitem__(self, idx: int) -> Dict:
        state = _random_state(idx)
        keys = list(self.loaders.keys())
        if self.shuffle_loaders:
            state.shuffle(keys)

        kwargs = self._draw_kwargs(state, idx)
        item = {keys[0]: self.loaders[keys[0]](**kwargs)}
        anchor = item[keys[0]]

        for key in keys[1:]:
            if self.aligned:
                # every follower re-reads the anchor's excerpt window from
                # its own aligned list position
                kwargs.update(
                    offset=anchor["signal"].metadata.get("offset"),
                    source_idx=anchor["source_idx"],
                    item_idx=anchor["item_idx"],
                )
            item[key] = self.loaders[key](**kwargs)

        # restore declaration order regardless of shuffle_loaders
        item = {k: item[k] for k in self.loaders.keys()}
        item["idx"] = idx
        if self.transform is not None:
            first = next(iter(self.loaders.keys()))
            item["transform_args"] = self.transform.instantiate(
                state=state, signal=item[first]["signal"]
            )
        if len(self.loaders) == 1:
            item.update(item.pop(next(iter(self.loaders.keys()))))
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
