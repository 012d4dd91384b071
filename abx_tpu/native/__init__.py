"""Native (C) host-side components with transparent Python fallbacks.

Built on demand with the system compiler into the package cache; loaded via
ctypes (no pybind11 dependency).  Every consumer falls back to the pure
implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libnwalign.so')
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, 'nw_align.c')
        try:
            subprocess.run(
                ['gcc', '-O2', '-shared', '-fPIC', src, '-o', _LIB_PATH],
                check=True, capture_output=True, timeout=120)
        except Exception as e:  # no compiler / sandboxed: fall back
            logger.debug('native nw_align build failed: %s', e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nw_align.restype = ctypes.c_int
        lib.nw_align.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError as e:
        logger.debug('native nw_align load failed: %s', e)
    return _lib


def nw_align(query: str, template: str, match: int = 2, mismatch: int = -1,
             gap: int = -2) -> Optional[List[Tuple[int, int]]]:
    """C-accelerated semi-global alignment; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    nq, nt = len(query), len(template)
    out_qi = (ctypes.c_int * (nq + nt))()
    out_ti = (ctypes.c_int * (nq + nt))()
    n = lib.nw_align(query.encode(), nq, template.encode(), nt,
                     match, mismatch, gap, out_qi, out_ti)
    if n < 0:
        return None
    return [(out_qi[k], out_ti[k]) for k in range(n)]
