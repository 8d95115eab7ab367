"""Fast chained block hashing for prefix caching.

The reference hashes each full KV block's token ids chained with the
previous block's hash using xxhash64
(/root/reference/minivllm/engine/block_manager.py:128-152). Here the hash
runs in native code (minivllm_tpu/csrc/hostops.cpp, XXH64) loaded via
ctypes, with a pure-Python blake2b fallback when the shared library cannot
be built. Both paths are deterministic across processes/hosts, which the
multi-host replicated-scheduler design requires (SURVEY.md §7.3).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from pathlib import Path

__all__ = ["hash_token_block", "hash_token_blocks", "native_available"]

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_NAME = "libminivllm_host.so"

_lib: ctypes.CDLL | None = None
_tried = False


def _build_lib() -> Path | None:
    src = _CSRC / "hostops.cpp"
    out = _CSRC / _LIB_NAME
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MINIVLLM_TPU_NO_NATIVE"):
        return None
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.mv_hash_tokens.restype = ctypes.c_uint64
        lib.mv_hash_tokens.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_uint64,
        ]
        lib.mv_hash_token_blocks.restype = ctypes.c_size_t
        lib.mv_hash_token_blocks.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_uint64,
            ctypes.c_void_p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _py_hash(data: bytes, seed: int) -> int:
    h = hashlib.blake2b(
        data, digest_size=8, key=seed.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(h, "little")


def hash_token_block(token_ids: list[int], prefix_hash: int = 0) -> int:
    """Hash one block of token ids, chained with the previous block's hash."""
    lib = _load()
    arr = (ctypes.c_int32 * len(token_ids))(*token_ids)
    if lib is not None:
        return lib.mv_hash_tokens(arr, len(token_ids), prefix_hash & (2**64 - 1))
    return _py_hash(bytes(arr), prefix_hash & (2**64 - 1))


def hash_token_blocks(
    token_ids: list[int], block_size: int, seed: int = 0
) -> list[int]:
    """Chained hashes of every *full* block in `token_ids`.

    Returns [h0, h1, ...] where h_i covers blocks 0..i (h_i = H(block_i,
    seed=h_{i-1})).
    """
    num_blocks = len(token_ids) // block_size
    if num_blocks == 0:
        return []
    lib = _load()
    if lib is not None:
        n = num_blocks * block_size
        arr = (ctypes.c_int32 * n)(*token_ids[:n])
        out = (ctypes.c_uint64 * num_blocks)()
        lib.mv_hash_token_blocks(arr, n, block_size, seed & (2**64 - 1), out)
        return list(out)
    hashes = []
    h = seed
    for i in range(num_blocks):
        h = hash_token_block(
            token_ids[i * block_size : (i + 1) * block_size], h
        )
        hashes.append(h)
    return hashes


if __name__ == "__main__":
    print("native:", native_available(), file=sys.stderr)
    print(hash_token_blocks(list(range(128)), 64))
