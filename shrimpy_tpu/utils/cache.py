"""Bounded LRU mapping for compiled-program caches.

The RL backends cache one jitted closure (plus baked device operators)
per (PSF bytes, shape, settings) key. A long-lived service sweeping
PSFs or geometries must not accumulate compiled programs without bound,
so every such cache is a small LRU: eviction drops the Python closure
and its device constants; a re-visit re-bakes (the persistent XLA
compilation cache makes the recompile cheap).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class LruCache:
    """Minimal dict-like LRU (get touches, set evicts oldest)."""

    def __init__(self, maxsize: int = 8):
        if maxsize < 1:
            raise ValueError("maxsize must be >= 1")
        self.maxsize = maxsize
        self._data: OrderedDict[Hashable, Any] = OrderedDict()

    def __contains__(self, key: Hashable) -> bool:
        return key in self._data

    def __getitem__(self, key: Hashable) -> Any:
        value = self._data[key]
        self._data.move_to_end(key)
        return value

    def __setitem__(self, key: Hashable, value: Any) -> None:
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)

    def __len__(self) -> int:
        return len(self._data)

    def clear(self) -> None:
        self._data.clear()
