"""ctypes bridge to the native C++ host runtime (runtime/textproc.cpp).

Builds ``libldat.so`` on first use with the system ``g++`` (no pybind11 —
plain C ABI + ctypes) into ``runtime/build/``; falls back silently to the
pure-Python pipeline when no compiler is available or
``LDA_NO_NATIVE=1`` is set.  Token-level parity with the Python pipeline is
guaranteed by tests/test_native_textproc.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

__all__ = ["native_available", "preprocess_documents_native"]

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "runtime", "textproc.cpp")
_BUILD_DIR = os.path.join(_REPO, "runtime", "build")
_LIB = os.path.join(_BUILD_DIR, "libldat.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("LDA_NO_NATIVE"):
            return None
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ldat_preprocess.restype = ctypes.c_void_p
        lib.ldat_preprocess.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.ldat_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def preprocess_documents_native(
    docs: List[str], stopwords
) -> Optional[List[List[str]]]:
    """Run the C++ pipeline; returns None if the native library is absent."""
    lib = _load()
    if lib is None:
        return None

    encoded = [d.encode("utf-8") for d in docs]
    buf = b"".join(encoded)
    offsets = (ctypes.c_int64 * (len(docs) + 1))()
    pos = 0
    for i, e in enumerate(encoded):
        offsets[i] = pos
        pos += len(e)
    offsets[len(docs)] = pos

    sw = "\n".join(sorted(stopwords)).encode("utf-8")
    ptr = lib.ldat_preprocess(buf, offsets, len(docs), sw, len(sw))
    if not ptr:
        return None
    try:
        raw = ctypes.string_at(ptr)
    finally:
        lib.ldat_free(ptr)
    parts = raw.decode("utf-8").split("\x1e")
    # trailing separator after the last doc -> drop the final empty part
    return [p.split(" ") if p else [] for p in parts[: len(docs)]]
