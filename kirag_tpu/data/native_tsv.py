"""ctypes binding for the native DPR-TSV parser (native/tsv_corpus.cpp).

At 21M rows (psgs_w100.tsv, the DPR north-star corpus) the Python line loop
of :func:`kirag_tpu.data.corpus.load_psg_data` spends minutes building ~10GB
of per-row dict/str objects. The native parser returns three packed byte
blobs + int64 offset arrays; :class:`TsvPassages` serves the same
``{"id", "title", "text"}`` dicts lazily, so Python objects exist only for
rows actually touched.

Falls back transparently (raises ImportError-like OSError) when g++ or the
source is unavailable — callers keep the pure-Python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libtsv_corpus.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build_library() -> str:
    src = os.path.join(_NATIVE_DIR, "tsv_corpus.cpp")
    if not os.path.exists(src):
        raise FileNotFoundError(f"native source missing: {src}")
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    logger.info("building native tsv parser (g++ -O3 -fopenmp) ...")
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_library())
            lib.tsv_corpus_load.restype = ctypes.c_void_p
            lib.tsv_corpus_load.argtypes = [ctypes.c_char_p]
            lib.tsv_corpus_rows.restype = ctypes.c_int64
            lib.tsv_corpus_rows.argtypes = [ctypes.c_void_p]
            lib.tsv_corpus_offsets.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
            lib.tsv_corpus_blob_size.restype = ctypes.c_int64
            lib.tsv_corpus_blob_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.tsv_corpus_blob.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
            lib.tsv_corpus_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


class TsvPassages:
    """List-like lazy view over natively parsed passages.

    ``passages[i]`` materializes one ``{"id", "title", "text"}`` dict from
    the packed blobs; ``len``/iteration match the Python loader exactly
    (header skipped, short rows dropped)."""

    def __init__(self, blobs, offsets):
        self._blobs = blobs      # (ids bytes, texts bytes, titles bytes)
        self._offsets = offsets  # (id_off, text_off, title_off) int64 [n+1]
        self._n = len(offsets[0]) - 1

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, index):
        if isinstance(index, slice):
            return [self[i] for i in range(*index.indices(self._n))]
        if index < 0:
            index += self._n
        if not 0 <= index < self._n:
            raise IndexError(index)
        ids, texts, titles = self._blobs
        io, to, tto = self._offsets
        return {
            "id": ids[io[index]:io[index + 1]].decode("utf-8"),
            "title": titles[tto[index]:tto[index + 1]].decode("utf-8"),
            "text": texts[to[index]:to[index + 1]].decode("utf-8"),
        }

    def __iter__(self) -> Iterator[dict]:
        for i in range(self._n):
            yield self[i]


def load_psg_data_native(path: str) -> TsvPassages:
    """Parse a DPR TSV with the native loader; same row semantics as the
    Python `load_psg_data` (pinned by tests/test_native_tsv.py)."""
    lib = _load_library()
    handle = lib.tsv_corpus_load(os.fsencode(path))
    if not handle:
        raise OSError(f"native tsv parser failed to open {path}")
    try:
        n = lib.tsv_corpus_rows(handle)
        offs = [np.empty(n + 1, dtype=np.int64) for _ in range(3)]
        lib.tsv_corpus_offsets(
            handle, *(o.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
                      for o in offs))
        blobs = []
        for field in range(3):
            size = lib.tsv_corpus_blob_size(handle, field)
            buf = ctypes.create_string_buffer(max(size, 1))
            lib.tsv_corpus_blob(handle, field, buf)
            blobs.append(buf.raw[:size])
        # offsets come back as (id, text, title); blobs as (id, text, title)
        return TsvPassages((blobs[0], blobs[1], blobs[2]),
                           (offs[0], offs[1], offs[2]))
    finally:
        lib.tsv_corpus_free(handle)
