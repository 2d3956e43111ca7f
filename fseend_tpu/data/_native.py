"""Build + load the native (C) hot path of the FLAC decoder.

Compiles ``csrc/flac_native.c`` with the system C compiler at first import
(cached by source mtime under ``~/.cache/fseend_tpu``), loads it via
ctypes.  No pybind11 / pip machinery — a single translation unit with a
flat C ABI.  If no compiler is available (or ``FSEEND_FLAC_NATIVE=0``),
``lib`` is None and ``data/flac.py`` falls back to its pure-Python path,
which doubles as the parity oracle (tests/test_flac.py pins native ==
python on every subframe type).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "flac_native.c"


def _build() -> ctypes.CDLL | None:
    if os.environ.get("FSEEND_FLAC_NATIVE", "1") == "0":
        return None
    cache = Path(os.environ.get("FSEEND_NATIVE_CACHE",
                                Path.home() / ".cache" / "fseend_tpu"))
    try:
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"flac_native_{int(_SRC.stat().st_mtime)}.so"
        if not so.exists():
            for cc in ("cc", "gcc", "clang"):
                try:
                    with tempfile.NamedTemporaryFile(
                            suffix=".so", dir=cache, delete=False) as tmp:
                        pass
                    r = subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", str(_SRC),
                         "-o", tmp.name],
                        capture_output=True, timeout=120)
                    if r.returncode == 0:
                        os.replace(tmp.name, so)
                        break
                    os.unlink(tmp.name)
                except (OSError, subprocess.TimeoutExpired):
                    continue
            else:
                return None
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    LL, I, U8P, I64P, I32P = (ctypes.c_longlong, ctypes.c_int,
                              ctypes.POINTER(ctypes.c_uint8),
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int32))
    lib.flac_rice_residual.restype = LL
    lib.flac_rice_residual.argtypes = [U8P, LL, LL, LL, I, I, I64P]
    lib.flac_read_verbatim.restype = LL
    lib.flac_read_verbatim.argtypes = [U8P, LL, LL, LL, I, I64P]
    lib.flac_fixed_restore.restype = None
    lib.flac_fixed_restore.argtypes = [I64P, LL, I]
    lib.flac_lpc_restore.restype = None
    lib.flac_lpc_restore.argtypes = [I64P, LL, I, I32P, I]
    return lib


lib = _build()


def _u8(data: bytes):
    return ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))


def rice_residual(bits, n: int, predictor_order: int,
                  param_bits: int) -> np.ndarray:
    """Native drop-in for flac.py::_rice_residual (advances bits.pos)."""
    out = np.empty(n - predictor_order, np.int64)
    new_pos = lib.flac_rice_residual(
        _u8(bits.data), len(bits.data) * 8, bits.pos, n, predictor_order,
        param_bits, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if new_pos < 0:
        raise IndexError("FLAC bitstream overrun in residual")
    bits.pos = int(new_pos)
    return out


def read_verbatim(bits, n: int, depth: int) -> np.ndarray:
    out = np.empty(n, np.int64)
    new_pos = lib.flac_read_verbatim(
        _u8(bits.data), len(bits.data) * 8, bits.pos, n, depth,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if new_pos < 0:
        raise IndexError("FLAC bitstream overrun in verbatim subframe")
    bits.pos = int(new_pos)
    return out


def fixed_restore(out: np.ndarray, order: int) -> None:
    lib.flac_fixed_restore(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out), order)


def lpc_restore(out: np.ndarray, order: int, coefs, shift: int) -> None:
    c = np.asarray(coefs, np.int32)
    lib.flac_lpc_restore(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out), order,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), shift)
