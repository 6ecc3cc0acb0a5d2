"""Self-contained TFRecord + tf.Example reader (no tensorflow dependency).

The reference's Waymo preprocessing needs tensorflow just to read the
official Block-NeRF release (``/root/reference/data_preprocess/
fetch_data_from_tf_record.py:28-42``). This module implements the two
formats natively:

  * **TFRecord framing** — a flat stream of
    ``u64 length | u32 masked-crc32c(length) | payload | u32 masked-crc32c(
    payload)`` records, optionally wrapped in whole-stream gzip (the
    release's GZIP compression). Framing + CRC validation run through a
    small C++ extension (``native/tfrecord_io.cpp``, compiled on first use)
    with a pure-python fallback.
  * **tf.Example protobuf** — a minimal wire-format parser for the
    three-feature schema (BytesList / FloatList / Int64List). Packed float
    payloads are decoded zero-copy via ``np.frombuffer``.

Also provides the inverse (``encode_example`` / ``write_records``) so tests
and tools can synthesize fixtures without tensorflow either.
"""

from __future__ import annotations

import gzip
import io
import os
import struct

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (software, table-driven) + the TFRecord mask
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# native framing accelerator (optional)
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_lib():
    """Compile + load native/tfrecord_io.cpp on first use (g++ -O3); returns
    None when unavailable (pure-python fallback takes over)."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    _NATIVE = False
    try:
        import ctypes
        import subprocess
        import tempfile

        src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "native", "tfrecord_io.cpp",
        )
        if not os.path.exists(src):
            return None
        cache = os.path.join(tempfile.gettempdir(), "unbnerf_native")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, "tfrecord_io.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.tfr_split_records.restype = ctypes.c_longlong
        lib.tfr_split_records.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.c_int,
        ]
        _NATIVE = lib
        return lib
    except Exception:  # noqa: BLE001 — any toolchain issue -> fallback
        return None


def _split_records_native(buf: bytes, verify_crc: bool):
    import ctypes

    lib = _native_lib()
    if lib is None:
        return None
    cap = max(16, len(buf) // 32)
    while True:
        offs = (ctypes.c_uint64 * cap)()
        lens = (ctypes.c_uint64 * cap)()
        n = lib.tfr_split_records(
            buf, len(buf), offs, lens, cap, 1 if verify_crc else 0
        )
        if n == -2:  # capacity exceeded
            cap *= 4
            continue
        if n < 0:
            raise ValueError(f"corrupt TFRecord stream (native rc={n})")
        return [(offs[i], lens[i]) for i in range(n)]


def _split_records_python(buf: bytes, verify_crc: bool):
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord header")
        (length,) = struct.unpack_from("<Q", buf, pos)
        if verify_crc:
            (lcrc,) = struct.unpack_from("<I", buf, pos + 8)
            if masked_crc(buf[pos : pos + 8]) != lcrc:
                raise ValueError("TFRecord length crc mismatch")
        start = pos + 12
        if start + length + 4 > n:
            raise ValueError("truncated TFRecord payload")
        if verify_crc:
            (dcrc,) = struct.unpack_from("<I", buf, start + length)
            if masked_crc(buf[start : start + length]) != dcrc:
                raise ValueError("TFRecord payload crc mismatch")
        out.append((start, length))
        pos = start + length + 4
    return out


def read_records(path: str, verify_crc: bool = False) -> list[bytes]:
    """All record payloads of a TFRecord file (transparently gunzips)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    spans = _split_records_native(buf, verify_crc)
    if spans is None:
        spans = _split_records_python(buf, verify_crc)
    return [buf[o : o + l] for o, l in spans]


# ---------------------------------------------------------------------------
# minimal protobuf wire parser for tf.Example
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) — value is bytes for
    length-delimited, int for varint, raw 4/8 bytes otherwise."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            v = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _parse_feature(buf: bytes):
    """Feature = oneof {1: BytesList, 2: FloatList, 3: Int64List}."""
    for field, _, v in _fields(buf):
        if field == 1:  # BytesList{1: repeated bytes}
            return [fv for f2, _, fv in _fields(v) if f2 == 1]
        if field == 2:  # FloatList{1: repeated float (packed or not)}
            vals = []
            for f2, wt2, fv in _fields(v):
                if f2 != 1:
                    continue
                if wt2 == 2:  # packed
                    vals.append(np.frombuffer(fv, dtype="<f4"))
                else:  # single fixed32
                    vals.append(np.frombuffer(fv, dtype="<f4"))
            return (
                np.concatenate(vals) if vals else np.zeros((0,), np.float32)
            )
        if field == 3:  # Int64List{1: repeated varint (packed or not)}
            vals = []
            for f2, wt2, fv in _fields(v):
                if f2 != 1:
                    continue
                if wt2 == 2:  # packed varints
                    p = 0
                    while p < len(fv):
                        x, p = _read_varint(fv, p)
                        vals.append(x)
                else:
                    vals.append(fv)
            return vals
    return None


def parse_example(payload: bytes) -> dict:
    """tf.Example -> {name: BytesList list | float32 ndarray | int list}."""
    out = {}
    for field, _, v in _fields(payload):
        if field != 1:  # Example{1: Features}
            continue
        for f2, _, entry in _fields(v):
            if f2 != 1:  # Features{1: map<string, Feature>}
                continue
            name = None
            feat = None
            for f3, _, mv in _fields(entry):
                if f3 == 1:
                    name = mv.decode("utf-8")
                elif f3 == 2:
                    feat = mv
            if name is not None and feat is not None:
                out[name] = _parse_feature(feat)
    return out


# ---------------------------------------------------------------------------
# inverse: encode + write (fixture synthesis / tooling)
# ---------------------------------------------------------------------------

def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def encode_example(features: dict) -> bytes:
    """{name: bytes | [bytes] | float array | int array} -> tf.Example."""
    entries = b""
    for name, val in features.items():
        if isinstance(val, bytes):
            val = [val]
        if isinstance(val, (list, tuple)) and val and isinstance(val[0], bytes):
            fl = _ld(1, b"".join(_ld(1, b) for b in val))
        else:
            arr = np.asarray(val)
            if np.issubdtype(arr.dtype, np.floating):
                packed = arr.astype("<f4").tobytes()
                fl = _ld(2, _ld(1, packed))
            else:
                packed = b"".join(_varint(int(x)) for x in arr.reshape(-1))
                fl = _ld(3, _ld(1, packed))
        entry = _ld(1, name.encode()) + _ld(2, fl)
        entries += _ld(1, entry)
    return _ld(1, entries)


def write_records(path: str, payloads: list[bytes], compress: bool = False) -> None:
    raw = io.BytesIO()
    for p in payloads:
        hdr = struct.pack("<Q", len(p))
        raw.write(hdr)
        raw.write(struct.pack("<I", masked_crc(hdr)))
        raw.write(p)
        raw.write(struct.pack("<I", masked_crc(p)))
    data = raw.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
