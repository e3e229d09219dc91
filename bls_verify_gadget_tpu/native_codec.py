"""ctypes wrapper for the native C++ host codec (native/bls_host.cpp).

Builds lazily with g++ on first use; callers fall back to the golden python
codec when the toolchain or library is unavailable, so the framework has no
hard native dependency.

API (host boundary):
  g1_decompress_batch(list[bytes48]) -> list[point | None | ValueError-like]
  g2_decompress_batch(list[bytes96]) -> same
  g1_compress_batch(points) -> list[bytes48]
  g2_compress_batch(points) -> list[bytes96]
"""

import ctypes
import os
import pathlib
import subprocess

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbls_host.so"
_lib = None

STATUS_OK = 0
STATUS_INF = 1
REJECT_REASONS = {2: "bad flags", 3: "x out of range", 4: "not on curve", 5: "not in subgroup"}


def _build():
    subprocess.run(
        ["python", str(_NATIVE_DIR / "gen_constants.py")],
        check=True,
        cwd=str(_NATIVE_DIR.parent),
    )
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_NATIVE_DIR / "bls_host.cpp")],
        check=True,
    )


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bls_g1_decompress_batch.restype = ctypes.c_int
        lib.bls_g2_decompress_batch.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def g1_decompress_batch(blobs):
    """list of 48-byte strings -> list of (point | None for infinity);
    rejects become the string reason.  Falls back to the golden codec."""
    lib = get_lib()
    if lib is None:
        return _fallback_g1(blobs)
    n = len(blobs)
    raw = b"".join(blobs)
    if any(len(b) != 48 for b in blobs):
        return _fallback_g1(blobs)
    buf_in = ctypes.create_string_buffer(raw, 48 * n)
    buf_out = ctypes.create_string_buffer(96 * n)
    status = (ctypes.c_uint8 * n)()
    lib.bls_g1_decompress_batch(buf_in, ctypes.c_size_t(n), buf_out, status)
    out = []
    for i in range(n):
        st = status[i]
        if st == STATUS_OK:
            xy = buf_out.raw[96 * i : 96 * i + 96]
            out.append((int.from_bytes(xy[:48], "big"), int.from_bytes(xy[48:], "big")))
        elif st == STATUS_INF:
            out.append(None)
        else:
            out.append(REJECT_REASONS.get(st, "reject"))
    return out


def g2_decompress_batch(blobs):
    lib = get_lib()
    if lib is None:
        return _fallback_g2(blobs)
    n = len(blobs)
    if any(len(b) != 96 for b in blobs):
        return _fallback_g2(blobs)
    buf_in = ctypes.create_string_buffer(b"".join(blobs), 96 * n)
    buf_out = ctypes.create_string_buffer(192 * n)
    status = (ctypes.c_uint8 * n)()
    lib.bls_g2_decompress_batch(buf_in, ctypes.c_size_t(n), buf_out, status)
    out = []
    for i in range(n):
        st = status[i]
        if st == STATUS_OK:
            xy = buf_out.raw[192 * i : 192 * i + 192]
            out.append((
                (int.from_bytes(xy[:48], "big"), int.from_bytes(xy[48:96], "big")),
                (int.from_bytes(xy[96:144], "big"), int.from_bytes(xy[144:], "big")),
            ))
        elif st == STATUS_INF:
            out.append(None)
        else:
            out.append(REJECT_REASONS.get(st, "reject"))
    return out


def g1_compress_batch(points):
    lib = get_lib()
    if lib is None:
        from .golden import bls as gbls

        return [gbls.g1_compress(p) for p in points]
    n = len(points)
    xy = bytearray(96 * n)
    inf = (ctypes.c_uint8 * n)()
    for i, p in enumerate(points):
        if p is None:
            inf[i] = 1
        else:
            xy[96 * i : 96 * i + 48] = p[0].to_bytes(48, "big")
            xy[96 * i + 48 : 96 * i + 96] = p[1].to_bytes(48, "big")
    out = ctypes.create_string_buffer(48 * n)
    lib.bls_g1_compress_batch(bytes(xy), inf, ctypes.c_size_t(n), out)
    return [out.raw[48 * i : 48 * i + 48] for i in range(n)]


def g2_compress_batch(points):
    lib = get_lib()
    if lib is None:
        from .golden import bls as gbls

        return [gbls.g2_compress(p) for p in points]
    n = len(points)
    xy = bytearray(192 * n)
    inf = (ctypes.c_uint8 * n)()
    for i, p in enumerate(points):
        if p is None:
            inf[i] = 1
        else:
            xy[192 * i : 192 * i + 48] = p[0][0].to_bytes(48, "big")
            xy[192 * i + 48 : 192 * i + 96] = p[0][1].to_bytes(48, "big")
            xy[192 * i + 96 : 192 * i + 144] = p[1][0].to_bytes(48, "big")
            xy[192 * i + 144 : 192 * i + 192] = p[1][1].to_bytes(48, "big")
    out = ctypes.create_string_buffer(96 * n)
    lib.bls_g2_compress_batch(bytes(xy), inf, ctypes.c_size_t(n), out)
    return [out.raw[96 * i : 96 * i + 96] for i in range(n)]


def _fallback_g1(blobs):
    from .golden import bls as gbls

    out = []
    for b in blobs:
        try:
            out.append(gbls.g1_decompress(b))
        except ValueError as e:
            out.append(str(e))
    return out


def _fallback_g2(blobs):
    from .golden import bls as gbls

    out = []
    for b in blobs:
        try:
            out.append(gbls.g2_decompress(b))
        except ValueError as e:
            out.append(str(e))
    return out
