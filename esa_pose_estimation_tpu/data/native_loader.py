"""ctypes binding for the native shard loader (native/src/shard_loader.cpp).

Builds the shared library on first use (g++, libpng) and caches it under
``native/build/``.  Exposes :class:`NativeBatchLoader` with the same batch
dict interface as data/speed.BatchLoader, backed by C++ worker threads that
keep decoded batches ready ahead of the device step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from esa_pose_estimation_tpu.data.shards import NAME_LEN, read_meta

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          '..', '..'))
_SRC = os.path.join(_REPO_ROOT, 'native', 'src', 'shard_loader.cpp')
_BUILD_DIR = os.path.join(_REPO_ROOT, 'native', 'build')
_LIB_PATH = os.path.join(_BUILD_DIR, 'libshardloader.so')
_BUILD_LOCK = threading.Lock()


def build_library(force: bool = False) -> str:
    """Compile the loader if needed; returns the .so path."""
    with _BUILD_LOCK:
        if not force and os.path.exists(_LIB_PATH) and \
                os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
        os.makedirs(_BUILD_DIR, exist_ok=True)
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC,
               '-o', _LIB_PATH, '-lpng', '-lz', '-lpthread']
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.loader_meta.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint32)]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_uint8)] + \
        [ctypes.POINTER(ctypes.c_float)] * 4 + [ctypes.c_char_p]
    lib.loader_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.loader_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB: ctypes.CDLL | None = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB


class NativeBatchLoader:
    """Iterate batches from an SPD1 shard via the C++ runtime.

    Yields dicts {'frame' (B,H,W) uint8, 'bbox' (B,4), 'keypoints_2d'
    (B,K,2), 'quat' (B,4), 'trans' (B,3), 'name' [str]*B} — drop-in for
    data/speed.BatchLoader.  Frames stay uint8 on the host so the H2D
    transfer ships 1 byte/px (4x less bus/tunnel traffic); every device
    consumer (ops.crop resampling) casts to f32 on-chip.
    """

    def __init__(self, shard_path: str, batch_size: int,
                 n_threads: int = 4, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True):
        self.meta = read_meta(shard_path)
        self.batch_size = batch_size
        self._handle = _lib().loader_open(
            shard_path.encode(), batch_size, n_threads, int(shuffle),
            seed, int(drop_last))
        if not self._handle:
            raise OSError(f'failed to open shard {shard_path}')
        self._epoch = 0
        self._seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = self.meta.n_records // self.batch_size
        if not self.drop_last and self.meta.n_records % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        if self._epoch > 0:
            _lib().loader_reset(self._handle,
                                self._seed + self._epoch)
        self._epoch += 1
        m = self.meta
        b = self.batch_size
        while True:
            frames = np.empty((b, m.height, m.width), np.uint8)
            bbox = np.empty((b, 4), np.float32)
            kp2d = np.empty((b, m.n_kp, 2), np.float32)
            quat = np.empty((b, 4), np.float32)
            trans = np.empty((b, 3), np.float32)
            names = ctypes.create_string_buffer(b * NAME_LEN)
            count = _lib().loader_next(
                self._handle,
                frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                kp2d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                quat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                trans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                names)
            if count == 0:
                return
            name_list = [
                names.raw[i * NAME_LEN:(i + 1) * NAME_LEN].split(b'\0')[0]
                .decode() for i in range(count)]
            yield {
                'frame': frames[:count],
                'bbox': bbox[:count],
                'keypoints_2d': kp2d[:count],
                'quat': quat[:count],
                'trans': trans[:count],
                'name': name_list,
            }

    def close(self) -> None:
        if self._handle:
            _lib().loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
