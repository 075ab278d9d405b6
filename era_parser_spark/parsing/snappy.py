"""Pure-Python snappy codec (raw block format + framing format).

Era files store each beacon block as a snappy *framed* stream
(reference behavior: era_parser/ingestion/compression.py:4-52 — raw first,
framed fallback; format per google/snappy framing_format.txt).  This module
implements a complete raw-format decoder (all four tag types), a framed
decoder, and a valid literal-only encoder used by the test data generator
(literal-only output is legal snappy, just uncompressed).

Decoding uses the C++ snappy codec that ships inside pyarrow when present
(the varint preamble gives the exact output size the codec needs); the
pure-Python decoder below is the always-available fallback and the
reference implementation the property tests pin both paths against.
"""

from __future__ import annotations

import struct

try:  # C fast path: pyarrow bundles google/snappy (raw block format)
    import pyarrow as _pa

    _PA_SNAPPY = _pa.Codec("snappy") if _pa.Codec.is_available("snappy") else None
except Exception:  # pragma: no cover - pyarrow is expected in this env
    _PA_SNAPPY = None

_MAGIC_BODY = b"sNaPpY"
_MAGIC_CHUNK = b"\xff\x06\x00\x00" + _MAGIC_BODY

# --- CRC32C (Castagnoli), table-driven -------------------------------------

_CRC_TABLE: list[int] = []


def _build_table() -> None:
    poly = 0x82F63B78
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        _CRC_TABLE.append(c)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """Snappy framing masks the CRC so checksummed CRCs don't look like CRCs."""
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- raw block format -------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("varint too long for snappy preamble")


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress_raw(data: bytes) -> bytes:
    """Decode the snappy raw block format (C codec when available)."""
    if _PA_SNAPPY is not None:
        expected, _ = _read_varint(data, 0)
        return _PA_SNAPPY.decompress(data, expected).to_pybytes()
    return _decompress_raw_py(data)


def _decompress_raw_py(data: bytes) -> bytes:
    """Pure-Python raw decoder (literal + copy1/2/4 tags) — fallback + oracle."""
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:
                extra = length - 59
                length = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            length += 1
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        start = len(out) - offset
        # overlapping copies are defined byte-by-byte (RLE-style)
        while length > 0:
            take = min(length, offset)
            out += out[start : start + take]
            start += take
            length -= take
    if len(out) != expected:
        raise ValueError(f"snappy length mismatch: got {len(out)}, want {expected}")
    return bytes(out)


def compress_raw(data: bytes) -> bytes:
    """Literal-only raw encoding (valid snappy; used for test-data gen)."""
    out = bytearray(_write_varint(len(data)))
    pos = 0
    while pos < len(data) or (pos == 0 and not data):
        chunk = data[pos : pos + 0xFFFFFFFF]
        length = len(chunk)
        if length == 0:
            break
        lm1 = length - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 1 << 8:
            out.append(60 << 2)
            out += lm1.to_bytes(1, "little")
        elif lm1 < 1 << 16:
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        elif lm1 < 1 << 24:
            out.append(62 << 2)
            out += lm1.to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += lm1.to_bytes(4, "little")
        out += chunk
        pos += length
    return bytes(out)


# --- framing format ----------------------------------------------------------


def frame_decompress(data: bytes, verify_crc: bool = False) -> bytes:
    """Decode a snappy framed stream (stream identifier + data chunks)."""
    if not data.startswith(b"\xff"):
        raise ValueError("not a snappy framed stream")
    pos = 0
    out = bytearray()
    n = len(data)
    while pos < n:
        chunk_type = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "little")
        payload = data[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if chunk_type == 0xFF:  # stream identifier
            if payload != _MAGIC_BODY:
                raise ValueError("bad snappy stream identifier")
        elif chunk_type == 0x00:  # compressed data
            body = decompress_raw(payload[4:])
            if verify_crc and masked_crc32c(body) != int.from_bytes(payload[:4], "little"):
                raise ValueError("snappy chunk CRC mismatch")
            out += body
        elif chunk_type == 0x01:  # uncompressed data
            body = payload[4:]
            if verify_crc and masked_crc32c(body) != int.from_bytes(payload[:4], "little"):
                raise ValueError("snappy chunk CRC mismatch")
            out += body
        elif 0x02 <= chunk_type <= 0x7F:  # reserved unskippable
            raise ValueError(f"unskippable snappy chunk type 0x{chunk_type:02x}")
        # 0x80..0xFE reserved skippable: ignore
    return bytes(out)


def frame_compress(data: bytes) -> bytes:
    """Encode as a framed stream of compressed (literal-only) chunks."""
    out = bytearray(_MAGIC_CHUNK)
    pos = 0
    while True:
        chunk = data[pos : pos + 65536]
        body = masked_crc32c(chunk).to_bytes(4, "little") + compress_raw(chunk)
        out += b"\x00" + len(body).to_bytes(3, "little") + body
        pos += 65536
        if pos >= len(data):
            break
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Framed if it carries the stream identifier, else raw (the reference
    tries raw first then framed; era block payloads are framed in practice)."""
    if data.startswith(b"\xff\x06\x00\x00sNaPpY"):
        return frame_decompress(data)
    return decompress_raw(data)
