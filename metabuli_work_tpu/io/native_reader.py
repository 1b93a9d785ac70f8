"""ctypes binding for the native batch sequence reader (native/seqreader.cpp).

Builds the shared library on demand (g++ -O2, links zlib) and falls back
to the pure-Python readers when a toolchain is unavailable.  The native
path fills padded uint8 batch arrays directly — the exact layout the
device encode kernel consumes — so the host input stage does no per-read
Python work.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_SRC_DIR, "libseqreader.so")
    src = os.path.join(_SRC_DIR, "seqreader.cpp")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        try:
            subprocess.run(
                ["g++", "-O2", "-Wall", "-shared", "-fPIC", src, "-lz", "-o", so],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise RuntimeError(f"native seqreader build failed: {e}")
    lib = ctypes.CDLL(so)
    lib.sr_open.restype = ctypes.c_void_p
    lib.sr_open.argtypes = [ctypes.c_char_p]
    lib.sr_close.argtypes = [ctypes.c_void_p]
    lib.sr_next_batch.restype = ctypes.c_int
    lib.sr_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


class NativeBatchReader:
    """Iterate (names, seqs uint8 [n, max_len], lens int32 [n]) batches."""

    NAME_STRIDE = 128

    def __init__(self, path, batch_size=512, max_len=4096, want_quals=False):
        lib = _load()
        self._lib = lib
        self._h = lib.sr_open(str(path).encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.batch_size = batch_size
        self.max_len = max_len
        self.want_quals = want_quals

    def __iter__(self):
        return self

    def __next__(self):
        B, L = self.batch_size, self.max_len
        seqs = np.empty((B, L), dtype=np.uint8)
        lens = np.empty(B, dtype=np.int32)
        names = np.zeros(B * self.NAME_STRIDE, dtype=np.uint8)
        quals = np.empty((B, L), dtype=np.uint8) if self.want_quals else None
        n = self._lib.sr_next_batch(
            self._h, B, L,
            seqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            names.ctypes.data_as(ctypes.c_char_p), self.NAME_STRIDE,
            quals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if quals is not None
            else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)),
        )
        if n <= 0:
            self.close()
            raise StopIteration
        name_list = [
            bytes(names[i * self.NAME_STRIDE:(i + 1) * self.NAME_STRIDE]).split(b"\0", 1)[0].decode()
            for i in range(n)
        ]
        out = (name_list, seqs[:n], lens[:n])
        return out + ((quals[:n],) if quals is not None else ())

    def close(self):
        if self._h:
            self._lib.sr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
