"""Minimal SSZ (SimpleSerialize) codec — the subset beacon blocks need.

Unlike the reference's hand-rolled per-field offset slicing
(era_parser/parsing/ssz_utils.py, parsing/forks/*.py), this is a declarative
type system: one schema drives both decode (production) and encode (test
data generation), so round-trip tests pin the byte layout.

Serialization rules (consensus-specs ssz/simple-serialize.md):
  * basic uintN: N/8 bytes little-endian
  * fixed-size composites: concatenation of parts
  * variable-size fields inside containers: 4-byte LE offsets in the fixed
    part, payloads appended in order; field i spans [offset_i, offset_{i+1})
  * List[fixed-size elem]: plain concatenation (count = len/elem_size)
  * List[variable-size elem]: leading offset table, count = first_offset/4
  * Bitvector[N]: ceil(N/8) bytes; Bitlist[N]: data bits + sentinel bit

Decode is defensive (an era archive may hold forks newer than the schema):
ragged fixed-size list tails are truncated, equal offsets produce empty
fields, and out-of-range offsets raise SSZError rather than mis-slicing.

Rendered values are JSON-ready: uint64- -> int, uint128+ -> decimal string
(Beacon API convention), bytes -> 0x-hex.
"""

from __future__ import annotations

import struct

_U16 = struct.Struct("<H").unpack_from
_U32 = struct.Struct("<I").unpack_from
_U64 = struct.Struct("<Q").unpack_from


class SSZError(ValueError):
    pass


def read_u32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise SSZError(f"u32 read past end at {pos}")
    return _U32(data, pos)[0]


class SSZType:
    """fixed_size is None for variable-size types."""

    fixed_size: int | None = None

    def decode(self, data: bytes):
        raise NotImplementedError

    def encode(self, value) -> bytes:
        raise NotImplementedError


class Uint(SSZType):
    def __init__(self, bits: int):
        self.bits = bits
        self.fixed_size = bits // 8

    def decode(self, data: bytes):
        if len(data) != self.fixed_size:
            raise SSZError(f"uint{self.bits}: got {len(data)} bytes")
        n = int.from_bytes(data, "little")
        # Beacon API renders >64-bit ints (base_fee_per_gas) as dec strings.
        return n if self.bits <= 64 else str(n)

    def encode(self, value) -> bytes:
        return int(value).to_bytes(self.fixed_size, "little")


class ByteVector(SSZType):
    def __init__(self, length: int):
        self.fixed_size = length

    def decode(self, data: bytes):
        if len(data) != self.fixed_size:
            raise SSZError(f"bytes{self.fixed_size}: got {len(data)}")
        return "0x" + data.hex()

    def encode(self, value) -> bytes:
        raw = bytes.fromhex(value[2:] if isinstance(value, str) else value.hex())
        if len(raw) != self.fixed_size:
            raise SSZError(f"bytes{self.fixed_size}: encode got {len(raw)}")
        return raw


class ByteList(SSZType):
    def __init__(self, max_length: int):
        self.max_length = max_length

    def decode(self, data: bytes):
        return "0x" + data.hex()

    def encode(self, value) -> bytes:
        return bytes.fromhex(value[2:] if isinstance(value, str) else value.hex())


class Bitvector(SSZType):
    def __init__(self, bits: int):
        self.bits = bits
        self.fixed_size = (bits + 7) // 8

    def decode(self, data: bytes):
        if len(data) != self.fixed_size:
            raise SSZError(f"bitvector{self.bits}: got {len(data)} bytes")
        return "0x" + data.hex()

    def encode(self, value) -> bytes:
        raw = bytes.fromhex(value[2:])
        if len(raw) != self.fixed_size:
            raise SSZError("bitvector encode length mismatch")
        return raw


class Bitlist(SSZType):
    """Rendered as raw hex including the length-sentinel bit (Beacon API
    shows aggregation_bits exactly this way)."""

    def __init__(self, max_bits: int):
        self.max_bits = max_bits

    def decode(self, data: bytes):
        if not data:
            raise SSZError("bitlist must contain the sentinel bit")
        return "0x" + data.hex()

    def encode(self, value) -> bytes:
        return bytes.fromhex(value[2:])


class Vector(SSZType):
    def __init__(self, elem: SSZType, length: int):
        if elem.fixed_size is None:
            raise SSZError("variable-elem vectors not needed for blocks")
        self.elem = elem
        self.length = length
        self.fixed_size = elem.fixed_size * length

    def decode(self, data: bytes):
        es = self.elem.fixed_size
        if len(data) != self.fixed_size:
            raise SSZError(f"vector: got {len(data)}, want {self.fixed_size}")
        return [self.elem.decode(data[i * es : (i + 1) * es]) for i in range(self.length)]

    def encode(self, value) -> bytes:
        if len(value) != self.length:
            raise SSZError("vector encode length mismatch")
        return b"".join(self.elem.encode(v) for v in value)


class List(SSZType):
    def __init__(self, elem: SSZType, max_length: int):
        self.elem = elem
        self.max_length = max_length
        # element-kind specializations for the hot decode loop
        self._elem_is_u64 = isinstance(elem, Uint) and elem.bits == 64
        self._elem_is_bytes = isinstance(elem, (ByteVector, Bitvector))
        self._elem_is_hexlike = isinstance(elem, (ByteList, Bitlist))

    def decode(self, data: bytes):
        if not data:
            return []
        es = self.elem.fixed_size
        if es is not None:
            # truncate a ragged tail instead of failing the whole list
            count = len(data) // es
            if self._elem_is_u64:
                return list(struct.unpack_from(f"<{count}Q", data))
            if self._elem_is_bytes:
                return ["0x" + data[i * es : (i + 1) * es].hex() for i in range(count)]
            return [self.elem.decode(data[i * es : (i + 1) * es]) for i in range(count)]
        if len(data) < 4:
            raise SSZError("list offset table truncated")
        first = _U32(data, 0)[0]
        if first % 4 != 0 or first > len(data):
            raise SSZError(f"bad list offset table head {first}")
        count = first // 4
        offsets = struct.unpack_from(f"<{count}I", data)
        n = len(data)
        prev = first
        for hi in offsets[1:]:
            if hi < prev or hi > n:
                raise SSZError("list item offsets out of order")
            prev = hi
        bounds = offsets[1:] + (n,)
        if self._elem_is_hexlike and not isinstance(self.elem, Bitlist):
            return [
                "0x" + data[offsets[i] : bounds[i]].hex() for i in range(count)
            ]
        dec = self.elem.decode
        return [dec(data[offsets[i] : bounds[i]]) for i in range(count)]

    def encode(self, value) -> bytes:
        if self.elem.fixed_size is not None:
            return b"".join(self.elem.encode(v) for v in value)
        parts = [self.elem.encode(v) for v in value]
        offset = 4 * len(parts)
        head = bytearray()
        for p in parts:
            head += struct.pack("<I", offset)
            offset += len(p)
        return bytes(head) + b"".join(parts)


class Container(SSZType):
    def __init__(self, name: str, fields: list[tuple[str, SSZType]]):
        self.name = name
        self.fields = fields
        if all(t.fixed_size is not None for _, t in fields):
            self.fixed_size = sum(t.fixed_size for _, t in fields)
        else:
            self.fixed_size = None
        self._compiled = None

    def decode(self, data: bytes, include: set[str] | None = None) -> dict:
        """Decode; with `include`, only those top-level fields are decoded
        (offsets are still walked — the skip saves the expensive payload
        decode of big lists, which the reference cannot do: it always
        parses every field, era_parser/core/processor.py:401-404).

        Full decodes run through a schema-compiled function (static field
        offsets inlined, leaf fields with no per-field dispatch) — the hot
        path of the era scan; the generic walk below stays as the pruned
        path and the behavioral oracle the compiled form is tested against.
        """
        if include is None:
            fn = self._compiled
            if fn is None:
                fn = self._compiled = _compile_container(self)
            return fn(data)
        return self.decode_generic(data, include)

    def decode_generic(self, data: bytes, include: set[str] | None = None) -> dict:
        out: dict = {}
        variable: list[tuple[str, SSZType, int]] = []
        pos = 0
        for name, typ in self.fields:
            if typ.fixed_size is not None:
                chunk = data[pos : pos + typ.fixed_size]
                if len(chunk) != typ.fixed_size:
                    raise SSZError(f"{self.name}.{name}: fixed part truncated")
                if include is None or name in include:
                    out[name] = typ.decode(chunk)
                pos += typ.fixed_size
            else:
                variable.append((name, typ, read_u32(data, pos)))
                pos += 4
        bounds = [off for _, _, off in variable] + [len(data)]
        for i, (name, typ, off) in enumerate(variable):
            hi = bounds[i + 1]
            if off > hi or hi > len(data):
                raise SSZError(f"{self.name}.{name}: offsets out of order {off}..{hi}")
            if include is None or name in include:
                out[name] = typ.decode(data[off:hi])
        return out

    def encode(self, value: dict) -> bytes:
        fixed_parts: list[bytes | None] = []
        var_parts: list[bytes] = []
        fixed_len = 0
        for name, typ in self.fields:
            if typ.fixed_size is not None:
                part = typ.encode(value[name])
                fixed_parts.append(part)
                fixed_len += len(part)
            else:
                fixed_parts.append(None)
                var_parts.append(typ.encode(value[name]))
                fixed_len += 4
        out = bytearray()
        offset = fixed_len
        vi = 0
        for part in fixed_parts:
            if part is None:
                out += struct.pack("<I", offset)
                offset += len(var_parts[vi])
                vi += 1
            else:
                out += part
        for p in var_parts:
            out += p
        return bytes(out)


def _bitlist_slice(data: bytes, lo: int, hi: int) -> str:
    if hi == lo:
        raise SSZError("bitlist must contain the sentinel bit")
    return "0x" + data[lo:hi].hex()


def _compile_container(c: Container):
    """Build a specialized full-decode function for one container schema.

    The schema is static, so every fixed field lands at a known offset:
    the generated source inlines those slices (uints via prebound
    struct.unpack_from, byte fields as hex, nested fixed containers as
    dict literals) and reads each variable field's offset exactly once.
    Equivalence with the generic walk is pinned by the round-trip and
    Hypothesis suites (tests/test_parse_kernel.py, tests/test_property.py).
    """
    env = {"_u16": _U16, "_u32": _U32, "_u64": _U64, "SSZError": SSZError,
           "_bitlist": _bitlist_slice}
    n_closure = [0]

    def closure(fn) -> str:
        name = f"_c{n_closure[0]}"
        n_closure[0] += 1
        env[name] = fn
        return name

    def fixed_expr(typ: SSZType, lo: int) -> str:
        size = typ.fixed_size
        if isinstance(typ, Uint):
            if typ.bits <= 64:
                if size == 8:
                    return f"_u64(data, {lo})[0]"
                if size == 4:
                    return f"_u32(data, {lo})[0]"
                if size == 2:
                    return f"_u16(data, {lo})[0]"
                if size == 1:
                    return f"data[{lo}]"
                return f"int.from_bytes(data[{lo}:{lo + size}], 'little')"
            return f"str(int.from_bytes(data[{lo}:{lo + size}], 'little'))"
        if isinstance(typ, (ByteVector, Bitvector)):
            return f"'0x' + data[{lo}:{lo + size}].hex()"
        if isinstance(typ, Container):
            parts = []
            pos = lo
            for name, ft in typ.fields:
                parts.append(f"{name!r}: {fixed_expr(ft, pos)}")
                pos += ft.fixed_size
            return "{" + ", ".join(parts) + "}"
        # Vector (or any other fixed composite): delegate to its decoder
        return f"{closure(typ.decode)}(data[{lo}:{lo + size}])"

    fixed_len = sum(
        t.fixed_size if t.fixed_size is not None else 4 for _, t in c.fields
    )
    lines = ["def _dec(data):", "    L = len(data)"]
    if c.fixed_size is not None:
        lines.append(
            f"    if L != {c.fixed_size}:"
            f" raise SSZError('{c.name}: fixed part truncated')"
        )
    else:
        lines.append(
            f"    if L < {fixed_len}:"
            f" raise SSZError('{c.name}: fixed part truncated')"
        )
    items: list[tuple[str, object]] = []
    offs: list[str] = []
    pos = 0
    for name, typ in c.fields:
        if typ.fixed_size is not None:
            items.append((name, fixed_expr(typ, pos)))
            pos += typ.fixed_size
        else:
            var_i = len(offs)
            lines.append(f"    o{var_i} = _u32(data, {pos})[0]")
            offs.append(f"o{var_i}")
            items.append((name, (var_i, typ)))
            pos += 4
    if offs:
        chain = " <= ".join(offs + ["L"])
        lines.append(
            f"    if not ({chain}):"
            f" raise SSZError('{c.name}: offsets out of order')"
        )
    exprs = []
    k = len(offs)
    for name, item in items:
        if isinstance(item, tuple):
            i, typ = item
            hi = f"o{i + 1}" if i + 1 < k else "L"
            if isinstance(typ, ByteList):
                e = f"'0x' + data[o{i}:{hi}].hex()"
            elif isinstance(typ, Bitlist):
                e = f"_bitlist(data, o{i}, {hi})"
            else:
                e = f"{closure(typ.decode)}(data[o{i}:{hi}])"
            exprs.append(f"{name!r}: {e}")
        else:
            exprs.append(f"{name!r}: {item}")
    lines.append("    return {" + ", ".join(exprs) + "}")
    exec(compile("\n".join(lines), f"<ssz-compiled:{c.name}>", "exec"), env)
    return env["_dec"]
