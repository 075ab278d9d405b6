"""Columnar (Arrow-direct) decode for the hottest pruned era scans.

The round-5 scaling root-cause (docs/PLANS.md "Parse-kernel per-core
scaling") pinned the kernel's per-node ceiling on DRAM bandwidth and
allocator churn from millions of small PyObjects: the dict IR builds one
nested dict per block (and per attestation) which pyarrow then walks
field-by-field.  This module decodes SSZ straight into flat per-column
Python lists and assembles the Arrow block struct bottom-up
(`pa.StructArray.from_arrays` / `pa.ListArray.from_arrays`), skipping the
per-row dicts entirely.  Measured 2.0-2.9x on the decode+build step
(tools/profile_arrow_direct.py, driving THIS collector), with
byte-identical Arrow output.

Scope: the two hottest normalized tables — `blocks` (header +
randao/eth1_data/graffiti) and `attestations` — i.e. any pruned scan whose
`body_include` is a subset of SUPPORTED_FIELDS.  Everything else (full
decodes, payload tables) keeps the schema-compiled dict IR, which remains
the behavioral oracle: the differential suite pins this path byte-equal to
it on every fork.

Error semantics: `append` is atomic (no partial column state on failure)
and raises SSZError on malformed input like the generic decoder.  One
deliberate difference: it validates only the offsets it READS (header,
attestations span, per-attestation layout), so a block whose corruption
lives entirely in an un-requested field can decode here where the generic
pruned walk (which chains every top-level offset) would raise — more
permissive, never mis-sliced.

Reference parity note: the reference always decodes every field
(era_parser/core/processor.py:401-404) and has no columnar path at all;
this is engine-side optimization, not reference behavior.
"""

from __future__ import annotations

import struct

import pyarrow as pa

from era_parser_spark.parsing.ssz import SSZError

_U32 = struct.Struct("<I").unpack_from
_U64 = struct.Struct("<Q").unpack_from

#: body fields with a columnar decode; scans pruned to a subset of these
#: take the fast path
SUPPORTED_FIELDS = frozenset(
    {"randao_reveal", "eth1_data", "graffiti", "attestations"}
)

# Body layout constants shared by EVERY fork (phase0..electra declare the
# same first eight fields): fixed prefix randao(96)+eth1(72)+graffiti(32)
# = 200 bytes, then u32 offsets for proposer_slashings, attester_slashings,
# attestations, deposits, ...  The attestations payload spans
# [offset@208, offset@212).
_BODY_FIXED_PREFIX = 200
_ATT_OFF_POS = _BODY_FIXED_PREFIX + 4 * 2
_DEP_OFF_POS = _BODY_FIXED_PREFIX + 4 * 3


#: forks whose attestation layout this decoder knows.  Membership is
#: EXPLICIT (not `fork == "electra"` with a pre-electra fallthrough): a
#: future fork added to config/networks.py would otherwise silently take
#: the pre-electra branch — the fixed-size check still passes and
#: bits/signature slice fine, but committee_bits would be emitted null
#: while the dict IR decodes real values.  Unknown forks raise
#: UnsupportedForkError instead (loud; never mis-decoded).
PRE_ELECTRA_FORKS = frozenset({"phase0", "altair", "bellatrix", "capella", "deneb"})
ELECTRA_LIKE_FORKS = frozenset({"electra"})


class UnsupportedForkError(SSZError):
    """The columnar decoder has no attestation layout for this fork.

    Deliberately NOT swallowed by the scan's on_error='skip' block
    isolation (sources/era.py re-raises it): a new fork must fail the
    scan loudly with a pointer at arrow_direct=False, not silently drop
    or mis-decode every block of the new fork."""


def supports(body_include: set[str] | None) -> bool:
    """True if a scan pruned to `body_include` can use the columnar path."""
    return bool(body_include) and set(body_include) <= SUPPORTED_FIELDS


class ColumnarBlockCollector:
    """Accumulates decoded blocks column-wise; flush() emits the same Arrow
    block struct the dict IR produces (absent body fields are null)."""

    def __init__(self, block_type: pa.DataType, body_include: set[str]):
        self.block_type = block_type
        self.include = frozenset(body_include)
        if not supports(body_include):
            raise ValueError(f"unsupported body_include {body_include}")
        self._want_att = "attestations" in self.include
        self._want_randao = "randao_reveal" in self.include
        self._want_eth1 = "eth1_data" in self.include
        self._want_graffiti = "graffiti" in self.include
        self._msg_t = block_type.field("message").type
        self._body_t = self._msg_t.field("body").type
        if self._want_att:
            att_list_t = self._body_t.field("attestations").type
            self._att_t = att_list_t.value_type
            self._data_t = self._att_t.field("data").type
            self._chk_t = self._data_t.field("source").type
        if self._want_eth1:
            self._eth1_t = self._body_t.field("eth1_data").type
        self._reset()

    def _reset(self) -> None:
        self.n = 0
        self.c_slot: list[int] = []
        self.c_prop: list[int] = []
        self.c_parent: list[str] = []
        self.c_state: list[str] = []
        self.c_sig: list[str] = []
        self.c_randao: list[str] = []
        self.c_graffiti: list[str] = []
        self.c_dep_root: list[str] = []
        self.c_dep_cnt: list[int] = []
        self.c_blk_hash: list[str] = []
        self.att_off: list[int] = [0]
        self.a_bits: list[str] = []
        self.a_slot: list[int] = []
        self.a_index: list[int] = []
        self.a_bbr: list[str] = []
        self.a_sep: list[int] = []
        self.a_sroot: list[str] = []
        self.a_tep: list[int] = []
        self.a_troot: list[str] = []
        self.a_sig: list[str] = []
        self.a_committee: list[str | None] = []

    def __len__(self) -> int:
        return self.n

    def append(self, raw: bytes, fork: str) -> None:
        """Decode one SignedBeaconBlock; atomic — commits columns only
        after the whole block decoded cleanly."""
        L = len(raw)
        if L < 100:
            raise SSZError("SignedBeaconBlock: fixed part truncated")
        mv = memoryview(raw)
        msg_off = _U32(raw, 0)[0]
        if msg_off > L:
            raise SSZError("SignedBeaconBlock: offsets out of order")
        sig = "0x" + mv[4:100].hex()
        msg = mv[msg_off:]
        if len(msg) < 84:
            raise SSZError("BeaconBlock: fixed part truncated")
        slot = _U64(msg, 0)[0]
        prop = _U64(msg, 8)[0]
        parent = "0x" + msg[16:48].hex()
        state = "0x" + msg[48:80].hex()
        body_off = _U32(msg, 80)[0]
        if body_off > len(msg):
            raise SSZError("BeaconBlock: offsets out of order")
        body = msg[body_off:]
        nb = len(body)
        if nb < _DEP_OFF_POS + 4:
            raise SSZError("BeaconBlockBody: fixed part truncated")

        randao = graffiti = dep_root = blk_hash = ""
        dep_cnt = 0
        if self._want_randao:
            randao = "0x" + body[0:96].hex()
        if self._want_eth1:
            dep_root = "0x" + body[96:128].hex()
            dep_cnt = _U64(body, 128)[0]
            blk_hash = "0x" + body[136:168].hex()
        if self._want_graffiti:
            graffiti = "0x" + body[168:200].hex()

        n_new_att = 0
        if self._want_att:
            # explicit fork membership — an unknown (post-electra) fork
            # must not fall through to the pre-electra layout (see
            # UnsupportedForkError)
            if fork in ELECTRA_LIKE_FORKS:
                electra = True
            elif fork in PRE_ELECTRA_FORKS:
                electra = False
            else:
                raise UnsupportedForkError(
                    f"no columnar attestation layout for fork {fork!r}; "
                    f"rerun the scan with arrow_direct=False (dict IR)"
                )
            lo = _U32(body, _ATT_OFF_POS)[0]
            hi = _U32(body, _DEP_OFF_POS)[0]
            if not (lo <= hi <= nb):
                raise SSZError("BeaconBlockBody: offsets out of order")
            n_new_att = self._decode_attestations(bytes(body[lo:hi]), electra)

        # ---- commit (nothing above mutated collector state) ----
        self.c_slot.append(slot)
        self.c_prop.append(prop)
        self.c_parent.append(parent)
        self.c_state.append(state)
        self.c_sig.append(sig)
        if self._want_randao:
            self.c_randao.append(randao)
        if self._want_eth1:
            self.c_dep_root.append(dep_root)
            self.c_dep_cnt.append(dep_cnt)
            self.c_blk_hash.append(blk_hash)
        if self._want_graffiti:
            self.c_graffiti.append(graffiti)
        if self._want_att:
            self.att_off.append(self.att_off[-1] + n_new_att)
        self.n += 1

    def _decode_attestations(self, atts: bytes, electra: bool) -> int:
        """Decode a List[Attestation] payload into LOCAL lists, then extend
        the columns (so a malformed attestation leaves no partial state).
        Mirrors List.decode's offset-table validation and the container
        layouts: pre-electra [bits_off u32][data 128][sig 96][bits...],
        electra appends committee_bits Bitvector[64] (8 bytes) at 228."""
        if not atts:
            return 0
        n = len(atts)
        if n < 4:
            raise SSZError("list offset table truncated")
        first = _U32(atts, 0)[0]
        if first % 4 != 0 or first > n:
            raise SSZError(f"bad list offset table head {first}")
        count = first // 4
        offs = struct.unpack_from(f"<{count}I", atts)
        prev = first
        for h in offs[1:]:
            if h < prev or h > n:
                raise SSZError("list item offsets out of order")
            prev = h
        bounds = offs[1:] + (n,)
        fixed = 236 if electra else 228
        l_bits: list[str] = []
        l_slot: list[int] = []
        l_index: list[int] = []
        l_bbr: list[str] = []
        l_sep: list[int] = []
        l_sroot: list[str] = []
        l_tep: list[int] = []
        l_troot: list[str] = []
        l_sig: list[str] = []
        l_comm: list[str | None] = []
        mv = memoryview(atts)
        for i in range(count):
            a = mv[offs[i] : bounds[i]]
            na = len(a)
            if na < fixed:
                raise SSZError("Attestation: fixed part truncated")
            o0 = _U32(a, 0)[0]
            if o0 > na:
                raise SSZError("Attestation: offsets out of order")
            if o0 == na:
                raise SSZError("bitlist must contain the sentinel bit")
            l_bits.append("0x" + a[o0:].hex())
            l_slot.append(_U64(a, 4)[0])
            l_index.append(_U64(a, 12)[0])
            l_bbr.append("0x" + a[20:52].hex())
            l_sep.append(_U64(a, 52)[0])
            l_sroot.append("0x" + a[60:92].hex())
            l_tep.append(_U64(a, 92)[0])
            l_troot.append("0x" + a[100:132].hex())
            l_sig.append("0x" + a[132:228].hex())
            l_comm.append("0x" + a[228:236].hex() if electra else None)
        self.a_bits.extend(l_bits)
        self.a_slot.extend(l_slot)
        self.a_index.extend(l_index)
        self.a_bbr.extend(l_bbr)
        self.a_sep.extend(l_sep)
        self.a_sroot.extend(l_sroot)
        self.a_tep.extend(l_tep)
        self.a_troot.extend(l_troot)
        self.a_sig.extend(l_sig)
        self.a_committee.extend(l_comm)
        return count

    @staticmethod
    def _struct(typ: pa.StructType, children: dict, length: int) -> pa.StructArray:
        arrs = [
            children[f.name] if f.name in children else pa.nulls(length, f.type)
            for f in typ
        ]
        return pa.StructArray.from_arrays(arrs, fields=list(typ))

    def flush(self) -> pa.StructArray:
        i64, s = pa.int64(), pa.string()
        n = self.n
        body_children: dict = {}
        if self._want_randao:
            body_children["randao_reveal"] = pa.array(self.c_randao, s)
        if self._want_eth1:
            body_children["eth1_data"] = self._struct(
                self._eth1_t,
                {
                    "deposit_root": pa.array(self.c_dep_root, s),
                    "deposit_count": pa.array(self.c_dep_cnt, i64),
                    "block_hash": pa.array(self.c_blk_hash, s),
                },
                n,
            )
        if self._want_graffiti:
            body_children["graffiti"] = pa.array(self.c_graffiti, s)
        if self._want_att:
            n_att = len(self.a_slot)
            src = self._struct(
                self._chk_t,
                {"epoch": pa.array(self.a_sep, i64), "root": pa.array(self.a_sroot, s)},
                n_att,
            )
            tgt = self._struct(
                self._chk_t,
                {"epoch": pa.array(self.a_tep, i64), "root": pa.array(self.a_troot, s)},
                n_att,
            )
            data = self._struct(
                self._data_t,
                {
                    "slot": pa.array(self.a_slot, i64),
                    "index": pa.array(self.a_index, i64),
                    "beacon_block_root": pa.array(self.a_bbr, s),
                    "source": src,
                    "target": tgt,
                },
                n_att,
            )
            att_children = {
                "aggregation_bits": pa.array(self.a_bits, s),
                "data": data,
                "signature": pa.array(self.a_sig, s),
            }
            if any(f.name == "committee_bits" for f in self._att_t):
                att_children["committee_bits"] = pa.array(self.a_committee, s)
            att = self._struct(self._att_t, att_children, n_att)
            body_children["attestations"] = pa.ListArray.from_arrays(
                pa.array(self.att_off, pa.int32()), att
            )
        body = self._struct(self._body_t, body_children, n)
        msg = self._struct(
            self._msg_t,
            {
                "slot": pa.array(self.c_slot, i64),
                "proposer_index": pa.array(self.c_prop, i64),
                "parent_root": pa.array(self.c_parent, s),
                "state_root": pa.array(self.c_state, s),
                "body": body,
            },
            n,
        )
        out = self._struct(
            self.block_type, {"message": msg, "signature": pa.array(self.c_sig, s)}, n
        )
        self._reset()
        return out
