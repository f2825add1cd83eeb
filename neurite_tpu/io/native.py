"""
ctypes loader for the native host-pipeline kernels (io/_native/hostops.cpp).

The reference's host path is single-threaded numpy (SURVEY.md §3.2); the
native library multithreads the two measured hot spots — one-hot expansion
(`generators.py:1024-1051`) and quilt overlap aggregation (pystrum
`pl.quilt` nan-median, `seg.py:363-374`). The .so is compiled on first use
with the baked-in g++ and cached next to the source; every entry point falls
back to numpy when the toolchain or binary is unavailable, so the package
never hard-depends on native code.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_native')
_SRC = os.path.join(_DIR, 'hostops.cpp')
_SO = os.path.join(_DIR, 'hostops.so')

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    # per-process temp name: concurrent builders must not os.replace a file
    # another g++ is still writing (a torn .so would pass the mtime check and
    # poison every later run); the final rename stays atomic
    tmp = f'{_SO}.{os.getpid()}.tmp'
    cmd = ['g++', '-O3', '-fPIC', '-shared', '-pthread', '-std=c++17',
           _SRC, '-o', tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                # cached binary unloadable (e.g. corrupted by a legacy
                # concurrent build) — rebuild once before giving up
                _build()
                lib = ctypes.CDLL(_SO)
            c_i64 = ctypes.c_int64
            c_i32 = ctypes.c_int32
            pf = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
            pi = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
            pu = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
            lib.one_hot_f32.argtypes = [pi, c_i64, c_i32, pf]
            lib.one_hot_u8.argtypes = [pi, c_i64, c_i32, pu]
            lib.nanmedian_axis0.argtypes = [pf, c_i64, c_i64, pf]
            lib.nanmean_axis0.argtypes = [pf, c_i64, c_i64, pf]
            lib.relabel_i32.argtypes = [pi, c_i64, pi, c_i32, pi]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _fits_int32(a):
    """Values representable in int32? Otherwise the native cast would wrap
    (e.g. a >= 2^31 label one-hotting a wrong class instead of the all-zero
    row the numpy path produces) — fall back to numpy in that case."""
    if a.size == 0 or np.issubdtype(a.dtype, np.bool_):
        return True
    if not np.issubdtype(a.dtype, np.integer):
        return False
    info = np.iinfo(np.int32)
    if np.can_cast(a.dtype, np.int32):
        return True
    return bool((a.min() >= info.min) and (a.max() <= info.max))


def available():
    """True when the native library loaded (or could be built)."""
    return _load() is not None


def one_hot(labels, nb_labels, dtype=np.float32):
    """
    labels [*shape] int -> one-hot [*shape, nb_labels]; out-of-range labels
    produce all-zero rows. Multithreaded native path, numpy fallback.
    """
    labels = np.asarray(labels)
    shape = labels.shape
    lib = _load()
    if (lib is not None and dtype in (np.float32, np.uint8, bool)
            and _fits_int32(labels)):
        flat = np.ascontiguousarray(labels.reshape(-1), np.int32)
        if dtype == np.float32:
            out = np.empty((flat.size, nb_labels), np.float32)
            lib.one_hot_f32(flat, flat.size, nb_labels, out)
        else:
            out = np.empty((flat.size, nb_labels), np.uint8)
            lib.one_hot_u8(flat, flat.size, nb_labels, out)
            if dtype == bool:
                out = out.view(bool)
        return out.reshape(*shape, nb_labels)
    flat = labels.reshape(-1).astype(np.int64)
    out = np.zeros((flat.size, nb_labels), dtype)
    valid = (flat >= 0) & (flat < nb_labels)
    out[np.nonzero(valid)[0], flat[valid]] = 1
    return out.reshape(*shape, nb_labels)


def nan_aggregate_axis0(layers, agg='nanmedian'):
    """NaN-skipping median/mean over axis 0 of [L, *shape] float32."""
    layers = np.asarray(layers)
    assert agg in ('nanmedian', 'nanmean'), agg
    lib = _load()
    if lib is None:
        with np.errstate(invalid='ignore'):
            fn = np.nanmedian if agg == 'nanmedian' else np.nanmean
            return fn(layers, axis=0)
    shape = layers.shape[1:]
    flat = np.ascontiguousarray(layers.reshape(layers.shape[0], -1),
                                np.float32)
    out = np.empty(flat.shape[1], np.float32)
    fn = lib.nanmedian_axis0 if agg == 'nanmedian' else lib.nanmean_axis0
    fn(flat, flat.shape[0], flat.shape[1], out)
    return out.reshape(shape)


def relabel(vol, labels):
    """Map each voxel value to its index in `labels` (0 when absent)."""
    vol = np.asarray(vol)
    lib = _load()
    if (lib is None or vol.dtype.kind not in 'iu' or not _fits_int32(vol)
            or not _fits_int32(np.asarray(labels))):
        out = np.zeros(vol.shape, vol.dtype)
        for idx, val in enumerate(np.asarray(labels).reshape(-1)):
            out[vol == val] = idx
        return out
    flat = np.ascontiguousarray(vol.reshape(-1), np.int32)
    labs = np.ascontiguousarray(np.asarray(labels).reshape(-1), np.int32)
    out = np.empty(flat.size, np.int32)
    lib.relabel_i32(flat, flat.size, labs, labs.size, out)
    return out.reshape(vol.shape).astype(vol.dtype)
