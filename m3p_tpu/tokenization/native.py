"""ctypes binding for the native C++ unigram encoder (native/tokenizer.cpp).

Auto-builds ``libm3ptok.so`` with the in-tree Makefile on first use; falls
back to the pure-Python `UnigramModel` when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger("m3p_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libm3ptok.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception as e:  # toolchain missing — Python fallback takes over
        logger.warning("native tokenizer build failed: %s", e)
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.m3ptok_load.argtypes = [ctypes.c_char_p]
    lib.m3ptok_load.restype = ctypes.c_int32
    lib.m3ptok_vocab_size.argtypes = [ctypes.c_int32]
    lib.m3ptok_vocab_size.restype = ctypes.c_int32
    lib.m3ptok_encode.argtypes = [
        ctypes.c_int32, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.m3ptok_encode.restype = ctypes.c_int32
    lib.m3ptok_encode_batch.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32]
    lib.m3ptok_id_to_piece.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32]
    lib.m3ptok_id_to_piece.restype = ctypes.c_int32
    lib.m3ptok_piece_to_id.argtypes = [ctypes.c_int32, ctypes.c_char_p]
    lib.m3ptok_piece_to_id.restype = ctypes.c_int32
    lib.m3ptok_train.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_char_p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.m3ptok_train.restype = ctypes.c_int64
    _lib = lib
    return _lib


class NativeUnigram:
    """Native encoder over a TSV unigram model file."""

    def __init__(self, model_path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native tokenizer library unavailable")
        self._lib = lib
        self._model_path = model_path
        self._handle = lib.m3ptok_load(model_path.encode())
        if self._handle < 0:
            raise FileNotFoundError(model_path)

    # CDLL handles can't cross process boundaries (Grain workers pickle the
    # data source) — ship the model path, reload in the worker.
    def __getstate__(self):
        return {"_model_path": self._model_path}

    def __setstate__(self, state):
        self.__init__(state["_model_path"])

    def __len__(self) -> int:
        return int(self._lib.m3ptok_vocab_size(self._handle))

    def encode(self, text: str, max_ids: int = 4096) -> List[int]:
        buf = (ctypes.c_int32 * max_ids)()
        n = self._lib.m3ptok_encode(self._handle, text.encode(), buf, max_ids)
        return list(buf[:n])

    def encode_batch(self, texts: Sequence[str], max_ids: int = 256,
                     n_threads: int = 0) -> List[List[int]]:
        n = len(texts)
        if n == 0:
            return []
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 16)
        encoded = [t.encode() for t in texts]
        arr = (ctypes.c_char_p * n)(*encoded)
        out_ids = np.zeros((n, max_ids), np.int32)
        out_lens = np.zeros((n,), np.int32)
        self._lib.m3ptok_encode_batch(
            self._handle, arr, n,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_ids, n_threads)
        return [out_ids[i, :out_lens[i]].tolist() for i in range(n)]

    def id_to_piece(self, idx: int) -> str:
        buf = ctypes.create_string_buffer(64)
        n = self._lib.m3ptok_id_to_piece(self._handle, idx, buf, 64)
        return buf.raw[:n].decode("utf-8", errors="replace")

    def piece_to_id(self, piece: str) -> int:
        return int(self._lib.m3ptok_piece_to_id(self._handle, piece.encode()))


def native_train_unigram(
    corpus_paths: Sequence[str],
    out_path: str,
    vocab_size: int = 8000,
    max_piece_len: int = 12,
    seed_factor: int = 4,
    n_em_iters: int = 2,
) -> int:
    """Train a unigram vocabulary in the native C++ trainer
    (native/trainer.cpp) — model-for-model identical to
    `unigram.train_unigram` (parity test: tests/test_native_trainer.py).
    Writes the TSV model to ``out_path``; returns the trained vocab size.

    Raises RuntimeError when the native library is unavailable (callers fall
    back to the Python trainer).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native tokenizer library unavailable")
    encoded = [p.encode() for p in corpus_paths]
    arr = (ctypes.c_char_p * len(encoded))(*encoded)
    n = lib.m3ptok_train(arr, len(encoded), out_path.encode(),
                         vocab_size, max_piece_len, seed_factor, n_em_iters)
    if n < 0:
        raise IOError(f"native trainer failed (paths={list(corpus_paths)})")
    return int(n)
