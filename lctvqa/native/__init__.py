"""Native (C++) data-loader core.

The reference's only host-side concurrency is torch DataLoader worker
processes doing per-item Python work (SURVEY.md §2). Here the batch
assembly hot path — image row gather, valid-answer sampling, multi-choice
packing, and the tokenizer — has a C++ implementation (`src/native.cpp`)
loaded via ctypes, with a transparent numpy fallback when the shared
library hasn't been built. Build with:

    python -m lctvqa.native.build
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "liblctvqa_native.so")
_lib: Optional[ctypes.CDLL] = None


def lib_path() -> str:
    return _LIB_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lct_tokenize.restype = ctypes.c_int
    lib.lct_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_int]
    lib.lct_sample_answers.restype = None
    lib.lct_sample_answers.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    lib.lct_gather_rows.restype = None
    lib.lct_gather_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_longlong, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def tokenize(sentence: str) -> Optional[List[str]]:
    """Native tokenizer with the exact `(\\W+)`-split semantics of
    lctvqa.text.tokenize. Returns None if the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    raw = sentence.encode("utf-8")
    out = ctypes.create_string_buffer(2 * len(raw) + 16)
    n = lib.lct_tokenize(raw, out, len(out))
    if n < 0:
        return None
    s = out.value.decode("utf-8")
    return s.split("\n") if s else []


def sample_answers(enc_ans: np.ndarray, unk_idx: int, seed: int,
                   max_num_ans: int = 10):
    """enc_ans uint8 [B, A] -> (answer_label int32 [B],
    multi_choice int32 [B, max_num_ans]). None if lib missing."""
    lib = _load()
    if lib is None:
        return None
    enc_ans = np.ascontiguousarray(enc_ans, np.uint8)
    b, a = enc_ans.shape
    labels = np.empty(b, np.int32)
    mc = np.empty((b, max_num_ans), np.int32)
    lib.lct_sample_answers(
        enc_ans.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), b, a,
        unk_idx, ctypes.c_uint64(seed),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_num_ans)
    return labels, mc


def gather_rows(src: np.ndarray, rows: np.ndarray,
                num_threads: int = 1) -> Optional[np.ndarray]:
    """dst[i] = src[rows[i]] for uint8 arrays with any trailing shape.
    `num_threads` > 1 splits the copy across C++ threads (the reference's
    DataLoader num_workers analogue)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    rows = np.ascontiguousarray(rows, np.int32)
    item_bytes = int(np.prod(src.shape[1:]))
    dst = np.empty((len(rows),) + src.shape[1:], np.uint8)
    lib.lct_gather_rows(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(rows), ctypes.c_longlong(item_bytes),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(num_threads))
    return dst
