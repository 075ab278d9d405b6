"""Decision-gate microbenchmark for the Arrow-direct decode prototype.

Round-5 root cause (docs/PLANS.md "Parse-kernel per-core scaling"): the
kernel's ceiling is DRAM/allocator churn from millions of small PyObjects
(nested dicts/lists) in the dict IR.  The round-6 question: does decoding
SSZ straight into per-column flat lists (no per-block dict, Arrow structs
assembled bottom-up from columns) buy >= 1.3x on the two hottest pruned
scans (blocks-table fields, attestations)?

Usage: python tools/profile_arrow_direct.py [n_blocks] [reps]
Prints a JSON line per variant: decode+arrow-build wall time over one
synthetic era's block payloads, identical output verified against the
dict-IR path before timing.
"""

from __future__ import annotations

import json
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from era_parser_spark.parsing import snappy
from era_parser_spark.parsing.beacon import parse_block
from era_parser_spark.parsing.e2store import TYPE_COMPRESSED_BLOCK, iter_records
from era_parser_spark.sources.era import _PARSE_OUT_ARROW
from era_parser_spark.testing.era_gen import era_filename, write_synthetic_era

_U32 = struct.Struct("<I").unpack_from
_U64 = struct.Struct("<Q").unpack_from

BLOCK_TYPE = _PARSE_OUT_ARROW.field("block").type


def _era_payloads(n_blocks: int) -> list[bytes]:
    d = tempfile.mkdtemp()
    path = os.path.join(d, era_filename("gnosis", 1600))  # deneb-era gnosis
    write_synthetic_era(path, 1600, "gnosis", blocks=n_blocks)
    with open(path, "rb") as f:
        content = f.read()
    return [
        snappy.decompress(rec.payload)
        for rec in iter_records(content)
        if rec.record_type == TYPE_COMPRESSED_BLOCK
    ]


# --------------------------------------------------------------------------
# variant A: the current dict IR (what sources/era.py does today)
# --------------------------------------------------------------------------


def dict_ir(raws: list[bytes], include: set[str]) -> pa.Array:
    docs = [
        parse_block(r, "gnosis", is_compressed=False, body_include=include)["data"]
        for r in raws
    ]
    return pa.array(docs, type=BLOCK_TYPE)


# --------------------------------------------------------------------------
# variant B: columnar decode, Arrow built from flat per-column lists
# --------------------------------------------------------------------------


def columnar_attestations(raws: list[bytes], fork: str = "deneb") -> pa.Array:
    """Decode ONLY headers + attestations, appending leaves to flat lists;
    assemble the block struct bottom-up with pa.StructArray/ListArray."""
    n = len(raws)
    slot_c: list[int] = [0] * n
    prop_c: list[int] = [0] * n
    parent_c: list[str] = [""] * n
    state_c: list[str] = [""] * n
    sig_c: list[str] = [""] * n
    att_off = [0] * (n + 1)
    agg: list[str] = []
    a_slot: list[int] = []
    a_index: list[int] = []
    a_bbr: list[str] = []
    a_sep: list[int] = []
    a_sroot: list[str] = []
    a_tep: list[int] = []
    a_troot: list[str] = []
    a_sig: list[str] = []

    # body var-field offset position of `attestations` for this fork:
    # fixed prefix randao(96)+eth1(72)+graffiti(32)=200, then u32 offsets
    # for proposer_slashings, attester_slashings, attestations, ...
    ATT_OFF_POS = 200 + 4 * 2
    NEXT_OFF_POS = 200 + 4 * 3

    for bi, raw in enumerate(raws):
        msg_off = _U32(raw, 0)[0]
        sig_c[bi] = "0x" + raw[4:100].hex()
        msg = memoryview(raw)[msg_off:]
        slot_c[bi] = _U64(msg, 0)[0]
        prop_c[bi] = _U64(msg, 8)[0]
        parent_c[bi] = "0x" + bytes(msg[16:48]).hex()
        state_c[bi] = "0x" + bytes(msg[48:80]).hex()
        body = msg[_U32(msg, 80)[0] :]
        lo = _U32(body, ATT_OFF_POS)[0]
        hi = _U32(body, NEXT_OFF_POS)[0]
        atts = bytes(body[lo:hi])
        if atts:
            first = _U32(atts, 0)[0]
            cnt = first // 4
            offs = struct.unpack_from(f"<{cnt}I", atts)
            bounds = offs[1:] + (len(atts),)
            for i in range(cnt):
                a = atts[offs[i] : bounds[i]]
                bits_off = _U32(a, 0)[0]
                agg.append("0x" + a[bits_off:].hex())
                a_slot.append(_U64(a, 4)[0])
                a_index.append(_U64(a, 12)[0])
                a_bbr.append("0x" + a[20:52].hex())
                a_sep.append(_U64(a, 52)[0])
                a_sroot.append("0x" + a[60:92].hex())
                a_tep.append(_U64(a, 92)[0])
                a_troot.append("0x" + a[100:132].hex())
                a_sig.append("0x" + a[132:228].hex())
            att_off[bi + 1] = att_off[bi] + cnt
        else:
            att_off[bi + 1] = att_off[bi]

    i64 = pa.int64()
    s = pa.string()
    n_att = len(a_slot)

    def struct_from(typ: pa.StructType, children: dict[str, pa.Array], length: int):
        arrs = []
        for f in typ:
            arrs.append(children.get(f.name) or pa.nulls(length, f.type))
        return pa.StructArray.from_arrays(arrs, fields=list(typ))

    chk_t = None
    att_t = None
    body_t = None
    msg_t = None
    for f in BLOCK_TYPE:
        if f.name == "message":
            msg_t = f.type
    for f in msg_t:
        if f.name == "body":
            body_t = f.type
    att_list_t = body_t.field("attestations").type
    att_t = att_list_t.value_type
    data_t = att_t.field("data").type
    chk_t = data_t.field("source").type

    src = struct_from(chk_t, {"epoch": pa.array(a_sep, i64), "root": pa.array(a_sroot, s)}, n_att)
    tgt = struct_from(chk_t, {"epoch": pa.array(a_tep, i64), "root": pa.array(a_troot, s)}, n_att)
    data = struct_from(
        data_t,
        {
            "slot": pa.array(a_slot, i64),
            "index": pa.array(a_index, i64),
            "beacon_block_root": pa.array(a_bbr, s),
            "source": src,
            "target": tgt,
        },
        n_att,
    )
    att = struct_from(
        att_t,
        {
            "aggregation_bits": pa.array(agg, s),
            "data": data,
            "signature": pa.array(a_sig, s),
        },
        n_att,
    )
    att_list = pa.ListArray.from_arrays(pa.array(att_off, pa.int32()), att)
    body = struct_from(body_t, {"attestations": att_list}, n)
    msg = struct_from(
        msg_t,
        {
            "slot": pa.array(slot_c, i64),
            "proposer_index": pa.array(prop_c, i64),
            "parent_root": pa.array(parent_c, s),
            "state_root": pa.array(state_c, s),
            "body": body,
        },
        n,
    )
    return struct_from(BLOCK_TYPE, {"message": msg, "signature": pa.array(sig_c, s)}, n)


def columnar_blocks_table(raws: list[bytes]) -> pa.Array:
    """Decode ONLY the blocks-table fields (header + randao/eth1/graffiti)."""
    n = len(raws)
    slot_c = [0] * n
    prop_c = [0] * n
    parent_c = [""] * n
    state_c = [""] * n
    sig_c = [""] * n
    randao = [""] * n
    graffiti = [""] * n
    dep_root = [""] * n
    dep_cnt = [0] * n
    blk_hash = [""] * n
    for bi, raw in enumerate(raws):
        msg_off = _U32(raw, 0)[0]
        sig_c[bi] = "0x" + raw[4:100].hex()
        msg = memoryview(raw)[msg_off:]
        slot_c[bi] = _U64(msg, 0)[0]
        prop_c[bi] = _U64(msg, 8)[0]
        parent_c[bi] = "0x" + bytes(msg[16:48]).hex()
        state_c[bi] = "0x" + bytes(msg[48:80]).hex()
        body = bytes(msg[_U32(msg, 80)[0] :][:200])
        randao[bi] = "0x" + body[0:96].hex()
        dep_root[bi] = "0x" + body[96:128].hex()
        dep_cnt[bi] = _U64(body, 128)[0]
        blk_hash[bi] = "0x" + body[136:168].hex()
        graffiti[bi] = "0x" + body[168:200].hex()

    i64, s = pa.int64(), pa.string()
    msg_t = BLOCK_TYPE.field("message").type
    body_t = msg_t.field("body").type
    eth1_t = body_t.field("eth1_data").type

    def struct_from(typ, children, length):
        arrs = [children.get(f.name) or pa.nulls(length, f.type) for f in typ]
        return pa.StructArray.from_arrays(arrs, fields=list(typ))

    eth1 = struct_from(
        eth1_t,
        {
            "deposit_root": pa.array(dep_root, s),
            "deposit_count": pa.array(dep_cnt, i64),
            "block_hash": pa.array(blk_hash, s),
        },
        n,
    )
    body = struct_from(
        body_t,
        {
            "randao_reveal": pa.array(randao, s),
            "eth1_data": eth1,
            "graffiti": pa.array(graffiti, s),
        },
        n,
    )
    msg = struct_from(
        msg_t,
        {
            "slot": pa.array(slot_c, i64),
            "proposer_index": pa.array(prop_c, i64),
            "parent_root": pa.array(parent_c, s),
            "state_root": pa.array(state_c, s),
            "body": body,
        },
        n,
    )
    return struct_from(BLOCK_TYPE, {"message": msg, "signature": pa.array(sig_c, s)}, n)


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    raws = _era_payloads(n_blocks)
    print(f"# {len(raws)} blocks", file=sys.stderr)

    cases = {
        "attestations": (
            lambda: dict_ir(raws, {"attestations"}),
            lambda: columnar_attestations(raws),
        ),
        "blocks_table": (
            lambda: dict_ir(raws, {"eth1_data", "graffiti", "randao_reveal"}),
            lambda: columnar_blocks_table(raws),
        ),
    }
    for name, (a_fn, b_fn) in cases.items():
        a0, b0 = a_fn(), b_fn()
        equal = a0.equals(b0)
        best_a = min(
            (lambda t0=time.perf_counter(): (a_fn(), time.perf_counter() - t0)[1])()
            for _ in range(reps)
        )
        best_b = min(
            (lambda t0=time.perf_counter(): (b_fn(), time.perf_counter() - t0)[1])()
            for _ in range(reps)
        )
        print(
            json.dumps(
                {
                    "case": name,
                    "dict_ir_sec": round(best_a, 4),
                    "columnar_sec": round(best_b, 4),
                    "speedup": round(best_a / best_b, 2),
                    "outputs_equal": equal,
                }
            )
        )


if __name__ == "__main__":
    main()
