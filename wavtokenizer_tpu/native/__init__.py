"""Native (C++) runtime components, bound via ctypes.

``wt_data_loader.cc`` implements the training data pipeline (WAV decode,
mono mix, sox-style gain norm, polyphase sinc resample, crop/pad, threaded
batch prefetch) as a shared library.  It is compiled on demand with g++
(no pybind11 in the image) and cached next to the source; environments
without a toolchain fall back to the pure-Python pipeline in train/data.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wt_data_loader.cc")
_lib = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_HERE, f"_libwtdata_{digest}.so")


def build(verbose: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    path = _lib_path()
    if not os.path.exists(path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", path + ".tmp"]
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(f"native build failed:\n{res.stderr}")
        os.replace(path + ".tmp", path)
        if verbose:
            print(f"built {path}")
    return path


def load_library():
    """ctypes handle to the native library (building it if necessary)."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.wtl_create.restype = ctypes.c_void_p
        lib.wtl_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_ulonglong, ctypes.c_longlong]
        lib.wtl_next.restype = ctypes.c_int
        lib.wtl_next.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.wtl_errors.restype = ctypes.c_long
        lib.wtl_errors.argtypes = [ctypes.c_void_p]
        lib.wtl_num_files.restype = ctypes.c_long
        lib.wtl_num_files.argtypes = [ctypes.c_void_p]
        lib.wtl_destroy.argtypes = [ctypes.c_void_p]
        lib.wtl_read_wav.restype = ctypes.c_int
        lib.wtl_read_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
        lib.wtl_resample.restype = ctypes.c_long
        lib.wtl_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


def read_wav_mono(path: str) -> tuple[np.ndarray, int]:
    """Decode a WAV file to mono float32 via the native parser."""
    lib = load_library()
    n = ctypes.c_long()
    sr = ctypes.c_int()
    if lib.wtl_read_wav(path.encode(), None, ctypes.byref(n), ctypes.byref(sr)):
        raise IOError(f"cannot decode {path}")
    out = np.empty(n.value, dtype=np.float32)
    lib.wtl_read_wav(path.encode(),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     ctypes.byref(n), ctypes.byref(sr))
    return out, sr.value


def resample_native(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase sinc resample in C++ (same filter design as ops.resample)."""
    lib = load_library()
    x = np.ascontiguousarray(x, dtype=np.float32)
    ptr = x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n_out = lib.wtl_resample(ptr, len(x), orig_sr, new_sr, None)
    out = np.empty(n_out, dtype=np.float32)
    lib.wtl_resample(ptr, len(x), orig_sr, new_sr,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class NativeDataLoader:
    """Threaded native batch loader (drop-in for train.data.data_loader).

    Yields (batch_size, num_samples) float32 arrays forever (epochs chained,
    reshuffled per epoch).  Deterministic for a given seed regardless of
    thread count.
    """

    def __init__(self, filelist: list[str], sample_rate: int = 24000,
                 num_samples: int = 72000, batch_size: int = 40,
                 train: bool = True, shuffle: bool | None = None,
                 drop_last: bool = True, num_threads: int = 4,
                 queue_cap: int = 4, seed: int = 0, start_seq: int = 0):
        """``start_seq`` fast-forwards the deterministic stream to global
        batch index N without decoding — exact mid-run resume positioning
        (batch composition/crops are pure functions of (seed, seq))."""
        self._lib = load_library()
        joined = "\n".join(filelist).encode()
        self._h = self._lib.wtl_create(
            joined, sample_rate, num_samples, batch_size, int(train),
            int(train if shuffle is None else shuffle), int(drop_last),
            num_threads, queue_cap, seed, start_seq)
        if not self._h:
            raise ValueError("empty filelist or bad batch size")
        self.batch_size = batch_size
        self.num_samples = num_samples

    def next_batch(self) -> np.ndarray:
        out = np.empty((self.batch_size, self.num_samples), dtype=np.float32)
        if self._lib.wtl_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))):
            raise StopIteration
        return out

    @property
    def errors(self) -> int:
        return self._lib.wtl_errors(self._h)

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        if self._h:
            self._lib.wtl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
