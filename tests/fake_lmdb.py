"""Minimal pure-Python stand-in for the ``lmdb`` package (test fixture).

The image has no ``lmdb`` module, so the clovaai-layout readers
(``data/lmdb_data.py``, mirroring reference coco_dataset.py:386-470) would
otherwise never execute.  This implements exactly the API surface our
reader uses — ``lmdb.open(...)`` -> env, ``env.begin(write=...)`` context
manager, ``txn.get(bytes)`` / ``txn.put(bytes, bytes)`` — over a pickled
dict stored as ``data.mdb`` in the env directory.  Tests install it with
``monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)``.

Byte-for-byte key semantics match the real package for our usage
(including ``b"label-%09d" % i`` formatted keys).
"""

from __future__ import annotations

import builtins
import os
import pickle


class _Txn:
    def __init__(self, env: "Environment", write: bool):
        self._env = env
        self._write = write

    def get(self, key: bytes):
        return self._env._store.get(bytes(key))

    def put(self, key: bytes, value: bytes):
        if not self._write:
            raise RuntimeError("read-only transaction")
        self._env._store[bytes(key)] = bytes(value)
        return True

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._write and exc_type is None:
            self._env._flush()
        return False


class Environment:
    def __init__(self, path: str, readonly: bool = False, **kw):
        os.makedirs(path, exist_ok=True)
        self._file = os.path.join(path, "data.mdb")
        self._readonly = readonly
        if os.path.exists(self._file):
            with builtins.open(self._file, "rb") as f:
                self._store = pickle.load(f)
        else:
            self._store = {}

    def begin(self, write: bool = False, **kw) -> _Txn:
        return _Txn(self, write)

    def _flush(self):
        with builtins.open(self._file, "wb") as f:
            pickle.dump(self._store, f)

    def sync(self):
        self._flush()

    def close(self):
        if not self._readonly:
            self._flush()


def open(path: str, **kw) -> Environment:  # noqa: A001 — lmdb API name
    return Environment(path, readonly=kw.get("readonly", False))
