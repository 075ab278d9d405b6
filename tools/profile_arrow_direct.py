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
# variant B: the SHIPPING columnar kernel (parsing/arrow_direct.py) — the
# profiler drives the real ColumnarBlockCollector so the gate always
# measures and equality-checks the code that actually runs in production
# (an earlier revision hand-copied the decode here and would have gone
# stale on any kernel change).
# --------------------------------------------------------------------------

from era_parser_spark.config.networks import fork_at_slot
from era_parser_spark.parsing.arrow_direct import ColumnarBlockCollector


def columnar(raws: list[bytes], include: set[str]) -> pa.Array:
    coll = ColumnarBlockCollector(BLOCK_TYPE, include)
    for raw in raws:
        slot = int.from_bytes(
            raw[_U32(raw, 0)[0] : _U32(raw, 0)[0] + 8], "little"
        )
        coll.append(raw, fork_at_slot(slot, "gnosis"))
    return coll.flush()


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    raws = _era_payloads(n_blocks)
    print(f"# {len(raws)} blocks", file=sys.stderr)

    cases = {
        "attestations": (
            lambda: dict_ir(raws, {"attestations"}),
            lambda: columnar(raws, {"attestations"}),
        ),
        "blocks_table": (
            lambda: dict_ir(raws, {"eth1_data", "graffiti", "randao_reveal"}),
            lambda: columnar(raws, {"eth1_data", "graffiti", "randao_reveal"}),
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
