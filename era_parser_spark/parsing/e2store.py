"""e2store era-file record layer.

Format (reference docs/ERA_FILE_FORMAT.md:27-40, era_reader.py:86-127):
an 8-byte record header — 2-byte type, 4-byte LE length, 2 reserved bytes —
followed by the payload; a version record (type 'e2', length 0) leads the
file.  Era files hold CompressedSignedBeaconBlock (0x01 0x00),
CompressedBeaconState (0x02 0x00) and SlotIndex ('i2') records.

The writer exists for test-data generation; production is read-only.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from collections.abc import Iterator

from era_parser_spark.parsing import snappy
from era_parser_spark.parsing.beacon import peek_slot

TYPE_VERSION = b"e2"
TYPE_COMPRESSED_BLOCK = b"\x01\x00"
TYPE_COMPRESSED_STATE = b"\x02\x00"
TYPE_SLOT_INDEX = b"i2"

_HEADER = struct.Struct("<2sIH")  # type, length, reserved


@dataclass
class EraRecord:
    record_type: bytes
    payload: bytes
    offset: int

    @property
    def kind(self) -> str:
        return {
            TYPE_VERSION: "version",
            TYPE_COMPRESSED_BLOCK: "block",
            TYPE_COMPRESSED_STATE: "state",
            TYPE_SLOT_INDEX: "slot_index",
        }.get(self.record_type, "unknown")


def iter_records(data: bytes) -> Iterator[EraRecord]:
    pos = 0
    n = len(data)
    while pos + _HEADER.size <= n:
        rtype, length, _ = _HEADER.unpack_from(data, pos)
        payload = data[pos + _HEADER.size : pos + _HEADER.size + length]
        if len(payload) != length:
            raise ValueError(f"truncated record at offset {pos}")
        yield EraRecord(rtype, payload, pos)
        pos += _HEADER.size + length


def iter_block_payloads(
    data: bytes, slot_range: tuple[int, int] | None = None
) -> Iterator[tuple[int, bytes]]:
    """(slot, compressed_payload) for each block record, file order.

    With `slot_range=(lo, hi)` (inclusive) the SlotIndex — which the
    reference writes off as unused (docs/ERA_FILE_FORMAT.md:38: "not
    currently used") — becomes a pushdown: only the matching records are
    sliced and NOTHING ELSE is even snappy-decompressed, because the slot
    comes from the index instead of peek_slot.  Files without a readable
    index fall back to the full scan + filter.
    """
    if slot_range is not None:
        idx = find_block_index(data)
        if idx is not None:
            lo, hi = slot_range
            for slot, off in idx.entries():
                if lo <= slot <= hi:
                    rtype, length, _ = _HEADER.unpack_from(data, off)
                    if rtype == TYPE_COMPRESSED_BLOCK:
                        yield slot, data[off + _HEADER.size : off + _HEADER.size + length]
            return
    for rec in iter_records(data):
        if rec.record_type == TYPE_COMPRESSED_BLOCK:
            slot = peek_slot(snappy.decompress(rec.payload))
            if slot_range is None or slot_range[0] <= slot <= slot_range[1]:
                yield slot, rec.payload


def era_stats(data: bytes) -> dict:
    """Record counts by kind + block slot range (reference era_reader:135-155).

    Slot min/max come from the SlotIndex when present (no decompression);
    the record walk still counts every record kind.
    """
    counts: dict[str, int] = {}
    block_offsets: list[int] = []
    for rec in iter_records(data):
        counts[rec.kind] = counts.get(rec.kind, 0) + 1
        if rec.record_type == TYPE_COMPRESSED_BLOCK:
            block_offsets.append(rec.offset)
    idx = find_block_index(data)
    if idx is not None:
        known = set(block_offsets)
        slots = [s for s, off in idx.entries() if off in known]
    else:
        slots = [
            peek_slot(snappy.decompress(rec.payload))
            for rec in iter_records(data)
            if rec.record_type == TYPE_COMPRESSED_BLOCK
        ]
    return {
        "record_counts": counts,
        "block_count": len(block_offsets),
        "min_slot": min(slots) if slots else None,
        "max_slot": max(slots) if slots else None,
    }


def _record(rtype: bytes, payload: bytes) -> bytes:
    return _HEADER.pack(rtype, len(payload), 0) + payload


def write_era(block_ssz_payloads: list[bytes], state: bytes | None = None) -> bytes:
    """Assemble an era file from raw SSZ block bytes (test-data generator).

    Each block is snappy-frame-compressed; a version record leads; an
    (unused-by-readers) slot index and optional state record follow, so the
    file exercises the scanner's skip paths like a real archive would.
    """
    out = bytearray(_record(TYPE_VERSION, b""))
    slots = []
    for ssz in block_ssz_payloads:
        slots.append(peek_slot(ssz))
        out += _record(TYPE_COMPRESSED_BLOCK, snappy.frame_compress(ssz))
    if state is not None:
        out += _record(TYPE_COMPRESSED_STATE, snappy.frame_compress(state))
    if slots:
        index = struct.pack("<q", min(slots)) + b"".join(
            struct.pack("<q", 0) for _ in slots
        ) + struct.pack("<q", len(slots))
        out += _record(TYPE_SLOT_INDEX, index)
    return bytes(out)
