"""Small bounded LRU mapping for module-level memo caches.

The memo caches in this package exist to keep ONE stable callable per
logical program so ``jax.jit`` retracing is avoided (see
``ops.sampling._DENSE_MV_BY_DTYPE`` for the original pattern). Keys are
often user-supplied callables (kernel closures, bound methods): a plain
module dict would then grow one entry per distinct closure identity for
the life of the process, pinning each closure's captured arrays AND its
compiled executables. A bounded LRU keeps the retrace-avoidance for the
hot recent keys while letting stale ones (and everything they pin) be
collected.
"""

from collections import OrderedDict


class BoundedCache:
    """dict-like LRU: ``get``/``setdefault``/``[]`` with max size."""

    def __init__(self, maxsize: int) -> None:
        self._maxsize = int(maxsize)
        self._data: OrderedDict = OrderedDict()

    def get(self, key, default=None):
        try:
            self._data.move_to_end(key)
        except KeyError:
            return default
        return self._data[key]

    def __contains__(self, key) -> bool:
        return key in self._data

    def __len__(self) -> int:
        return len(self._data)

    def __getitem__(self, key):
        self._data.move_to_end(key)
        return self._data[key]

    def __setitem__(self, key, value) -> None:
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self._maxsize:
            self._data.popitem(last=False)

    def setdefault(self, key, default):
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        self[key] = default
        return default

    def clear(self) -> None:
        self._data.clear()
