"""ctypes bridge to the native Goldilocks/Poseidon host library.

Loads csrc/libglposeidon.so (built by `make -C csrc`, auto-built on first
import if a compiler is available) and installs the python-generated
constants so the native permutation matches the pure-python mirror
bit-for-bit.  All entry points fall back to pure python when the library
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _csrc_dir() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PLONKY2_BN254_TPU_NO_NATIVE") == "1":
        return None
    so = _csrc_dir() / "libglposeidon.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_csrc_dir())],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gl_poseidon_init.argtypes = [u64p, u64p]
    lib.gl_poseidon_permute.argtypes = [u64p]
    lib.gl_poseidon_hash_no_pad.argtypes = [u64p, ctypes.c_int, u64p]
    lib.gl_poseidon_two_to_one.argtypes = [u64p, u64p, u64p]
    lib.gl_poseidon_verify_path.argtypes = [
        u64p,
        ctypes.c_uint64,
        u64p,
        ctypes.c_int,
        u64p,
    ]
    lib.gl_poseidon_verify_path.restype = ctypes.c_int

    from .poseidon_constants import MDS, ROUND_CONSTANTS

    rc = np.ascontiguousarray(ROUND_CONSTANTS, dtype=np.uint64)
    mds = np.ascontiguousarray(MDS.reshape(-1), dtype=np.uint64)
    lib.gl_poseidon_init(
        rc.ctypes.data_as(u64p), mds.ctypes.data_as(u64p)
    )
    _LIB = lib
    return _LIB


def _as_u64(arr) -> np.ndarray:
    return np.ascontiguousarray(np.array(arr, dtype=np.uint64))


def available() -> bool:
    return _load() is not None


def permute(state: List[int]) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    buf = _as_u64(state)
    lib.gl_poseidon_permute(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return [int(x) for x in buf]


def hash_no_pad(inputs: List[int]) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    buf = _as_u64(inputs)
    out = np.zeros(4, dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gl_poseidon_hash_no_pad(
        buf.ctypes.data_as(u64p), len(inputs), out.ctypes.data_as(u64p)
    )
    return [int(x) for x in out]


def two_to_one(left: List[int], right: List[int]) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    lb, rb = _as_u64(left), _as_u64(right)
    out = np.zeros(4, dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gl_poseidon_two_to_one(
        lb.ctypes.data_as(u64p), rb.ctypes.data_as(u64p), out.ctypes.data_as(u64p)
    )
    return [int(x) for x in out]


def verify_path(digest, index: int, path, cap_node) -> Optional[bool]:
    lib = _load()
    if lib is None:
        return None
    d = _as_u64(digest)
    p = _as_u64(np.array(path, dtype=np.uint64).reshape(-1))
    c = _as_u64(cap_node)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    return bool(
        lib.gl_poseidon_verify_path(
            d.ctypes.data_as(u64p),
            index,
            p.ctypes.data_as(u64p),
            len(path),
            c.ctypes.data_as(u64p),
        )
    )
