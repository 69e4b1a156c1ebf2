"""ctypes bindings for the native host runtime (``bjxa_host.cc``).

The shared library is compiled on demand with the system C++ toolchain the
first time it is needed (and recompiled whenever the source is newer), then
loaded via ctypes.  Everything degrades gracefully: if no toolchain is
available, ``lib()`` returns None and callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "bjxa_host.cc"
_CORE = _HERE / "xa_core.h"
_BUILD_DIR = _HERE / "_build"
_SO = _BUILD_DIR / "libbjxa_host.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _compile() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    tmp = _SO.with_suffix(".so.tmp")
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-fPIC",
        "-shared",
        "-std=c++17",
        "-o",
        str(tmp),
        str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    os.replace(tmp, _SO)
    return True


def lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("BJXA_NO_NATIVE"):
            return None
        try:
            src_mtime = max(_SRC.stat().st_mtime, _CORE.stat().st_mtime)
            if not _SO.exists() or _SO.stat().st_mtime < src_mtime:
                if not _compile():
                    return None
            cdll = ctypes.CDLL(str(_SO))
        except OSError:
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u32 = ctypes.c_uint32

        cdll.bjxa_host_decode_blocks.restype = ctypes.c_int
        cdll.bjxa_host_decode_blocks.argtypes = [
            u8p, u32, u32, u32, i32p, i16p, u32p,
        ]
        cdll.bjxa_host_encode_truncate.restype = ctypes.c_int
        cdll.bjxa_host_encode_truncate.argtypes = [i16p, u32, u32, u32, u8p]
        cdll.bjxa_host_encode_search.restype = ctypes.c_int
        cdll.bjxa_host_encode_search.argtypes = [
            i16p, u32, u32, u32, i32p, u8p,
        ]
        cdll.bjxa_host_abi_version.restype = ctypes.c_uint32
        assert cdll.bjxa_host_abi_version() == 1
        _lib = cdll
        return _lib


def available() -> bool:
    return lib() is not None


def _as_ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_blocks(
    blocks: np.ndarray, bits: int, state: np.ndarray
) -> tuple[np.ndarray, int]:
    """Decode ``uint8[nblocks, channels, block_size]`` effective blocks.

    ``state`` (``int32[channels, 2]``) is updated in place.  Returns
    ``(int16[nblocks*32, channels], blocks_done)``; ``blocks_done`` is less
    than ``nblocks`` iff an invalid profile stopped the stream.
    """
    cdll = lib()
    assert cdll is not None
    nblocks, channels, _ = blocks.shape
    blocks = np.ascontiguousarray(blocks, np.uint8)
    assert state.dtype == np.int32 and state.flags.c_contiguous
    pcm = np.empty((nblocks * 32, channels), np.int16)
    done = ctypes.c_uint32(0)
    rc = cdll.bjxa_host_decode_blocks(
        _as_ptr(blocks, ctypes.c_uint8),
        nblocks,
        channels,
        bits,
        _as_ptr(state, ctypes.c_int32),
        _as_ptr(pcm, ctypes.c_int16),
        ctypes.byref(done),
    )
    if rc not in (0, -71):  # 0 | -EPROTO
        raise RuntimeError(f"bjxa_host_decode_blocks failed: {rc}")
    return pcm, int(done.value) if rc else nblocks


def encode_blocks(
    pcm: np.ndarray, bits: int, state: np.ndarray, *, search: bool
) -> np.ndarray:
    """Encode zero-padded ``int16[nblocks*32, channels]`` PCM to raw blocks
    ``uint8[nblocks, channels, block_size]``; updates ``state`` in place
    when searching."""
    cdll = lib()
    assert cdll is not None
    frames, channels = pcm.shape
    nblocks = frames // 32
    pcm = np.ascontiguousarray(pcm, np.int16)
    out = np.empty((nblocks, channels, bits * 4 + 1), np.uint8)
    if search:
        rc = cdll.bjxa_host_encode_search(
            _as_ptr(pcm, ctypes.c_int16),
            nblocks,
            channels,
            bits,
            _as_ptr(state, ctypes.c_int32),
            _as_ptr(out, ctypes.c_uint8),
        )
    else:
        rc = cdll.bjxa_host_encode_truncate(
            _as_ptr(pcm, ctypes.c_int16),
            nblocks,
            channels,
            bits,
            _as_ptr(out, ctypes.c_uint8),
        )
    if rc != 0:
        raise RuntimeError(f"bjxa_host_encode failed: {rc}")
    return out
