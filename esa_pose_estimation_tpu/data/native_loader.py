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
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            # surface the compiler/linker diagnostics (a bare
            # CalledProcessError hides e.g. a missing libpng-dev)
            raise RuntimeError(
                f'native loader build failed (rc={proc.returncode}):\n'
                f'$ {" ".join(cmd)}\n{proc.stderr}')
        return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.loader_open2.restype = ctypes.c_void_p
    lib.loader_open2.argtypes = lib.loader_open.argtypes + [ctypes.c_int]
    lib.loader_open3.restype = ctypes.c_void_p
    lib.loader_open3.argtypes = lib.loader_open2.argtypes + \
        [ctypes.c_uint64, ctypes.c_uint64]
    lib.loader_meta.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint32)]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_uint8)] + \
        [ctypes.POINTER(ctypes.c_float)] * 4 + [ctypes.c_char_p]
    lib.loader_next_cropped.restype = ctypes.c_int
    lib.loader_next_cropped.argtypes = [ctypes.c_void_p] + \
        [ctypes.POINTER(ctypes.c_float)] * 7 + [ctypes.c_char_p]
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

    With ``crop_size`` set, the C++ workers run the ESA detector-box ->
    square crop -> bilinear resize stage on the host (reference
    data_load4.py:110-166 puts the same stage in its CPU DataLoader) and
    batches yield {'crop' (B,S,S) f32, 'rate' (B,), 'origin' (B,2)}
    instead of 'frame' — ~36x less H2D traffic per 1920x1200 frame.
    """

    def __init__(self, shard_path: str, batch_size: int,
                 n_threads: int = 4, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, crop_size: int | None = None,
                 process_id: int = 0, process_count: int = 1):
        self.meta = read_meta(shard_path)
        self.path = shard_path
        self.batch_size = batch_size
        self.crop_size = int(crop_size) if crop_size else 0
        # Multi-host ingest: process i of P serves the i-th contiguous
        # record slice of the shared shard (balanced to within one
        # record), streamed by the C++ runtime without coordination.
        if not 0 <= process_id < process_count:
            raise ValueError(f'process_id {process_id} outside '
                             f'process_count {process_count}')
        n = self.meta.n_records
        start = n * process_id // process_count
        self.n_local = n * (process_id + 1) // process_count - start
        self._handle = _lib().loader_open3(
            shard_path.encode(), batch_size, n_threads, int(shuffle),
            seed, int(drop_last), self.crop_size, start, self.n_local)
        if not self._handle:
            raise OSError(f'failed to open shard {shard_path}')
        self._epoch = 0
        self._seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = self.n_local // self.batch_size
        if not self.drop_last and self.n_local % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        if self._epoch > 0:
            _lib().loader_reset(self._handle,
                                self._seed + self._epoch)
        self._epoch += 1
        m = self.meta
        b = self.batch_size
        cs = self.crop_size
        fptr = ctypes.POINTER(ctypes.c_float)
        while True:
            bbox = np.empty((b, 4), np.float32)
            kp2d = np.empty((b, m.n_kp, 2), np.float32)
            quat = np.empty((b, 4), np.float32)
            trans = np.empty((b, 3), np.float32)
            names = ctypes.create_string_buffer(b * NAME_LEN)
            tail = (bbox.ctypes.data_as(fptr), kp2d.ctypes.data_as(fptr),
                    quat.ctypes.data_as(fptr), trans.ctypes.data_as(fptr),
                    names)
            if cs:
                crops = np.empty((b, cs, cs), np.float32)
                rate = np.empty((b,), np.float32)
                origin = np.empty((b, 2), np.float32)
                count = _lib().loader_next_cropped(
                    self._handle, crops.ctypes.data_as(fptr),
                    rate.ctypes.data_as(fptr),
                    origin.ctypes.data_as(fptr), *tail)
            else:
                frames = np.empty((b, m.height, m.width), np.uint8)
                count = _lib().loader_next(
                    self._handle,
                    frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    *tail)
            if count < 0:
                raise RuntimeError(
                    f'native loader I/O or decode error reading '
                    f'{self.path!r} (corrupt/truncated shard?)')
            if count == 0:
                return
            name_list = [
                names.raw[i * NAME_LEN:(i + 1) * NAME_LEN].split(b'\0')[0]
                .decode() for i in range(count)]
            out = {
                'bbox': bbox[:count],
                'keypoints_2d': kp2d[:count],
                'quat': quat[:count],
                'trans': trans[:count],
                'name': name_list,
            }
            if cs:
                out['crop'] = crops[:count]
                out['rate'] = rate[:count]
                out['origin'] = origin[:count]
            else:
                out['frame'] = frames[:count]
            yield out

    def close(self) -> None:
        if self._handle:
            _lib().loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
