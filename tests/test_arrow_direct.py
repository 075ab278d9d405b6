"""Columnar (Arrow-direct) decode path: byte-equality vs the dict IR on
every fork, atomic error behavior on malformed input, and the fast-path
dispatch rules.  The dict IR (schema-compiled containers) stays the
behavioral oracle — these tests pin the two paths together."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from era_parser_spark.parsing.arrow_direct import (
    ColumnarBlockCollector,
    supports,
)
from era_parser_spark.parsing.beacon import encode_signed_block, parse_block
from era_parser_spark.parsing.ssz import SSZError
from era_parser_spark.sources.era import _PARSE_OUT_ARROW
from era_parser_spark.testing.era_gen import era_filename, write_synthetic_era

BLOCK_TYPE = _PARSE_OUT_ARROW.field("block").type

# one era per fork family the generator supports on gnosis (the rehearsal
# corpus crosses deneb->electra at 2400-2911; 1600 is deneb, 800 capella)
FORK_ERAS = [800, 1600, 2905]

ALL_INCLUDES = [
    {"attestations"},
    {"eth1_data", "graffiti", "randao_reveal"},
    {"eth1_data", "graffiti", "randao_reveal", "attestations"},
]


def test_supports_dispatch():
    assert supports({"attestations"})
    assert supports({"eth1_data", "graffiti", "randao_reveal"})
    assert supports({"graffiti", "attestations"})
    assert not supports(None)  # full decode
    assert not supports(set())
    assert not supports({"execution_payload"})
    assert not supports({"attestations", "deposits"})


@pytest.mark.parametrize("era", FORK_ERAS)
@pytest.mark.parametrize("include", ALL_INCLUDES, ids=lambda s: "+".join(sorted(s)))
def test_columnar_equals_dict_ir_per_fork(tmp_path, era, include):
    """Arrow output of the columnar path must EQUAL the dict IR's
    (pa.Array.equals is a deep byte compare) on real synthetic eras."""
    from era_parser_spark.parsing import snappy
    from era_parser_spark.parsing.e2store import TYPE_COMPRESSED_BLOCK, iter_records

    path = os.path.join(str(tmp_path), era_filename("gnosis", era))
    write_synthetic_era(path, era, "gnosis", blocks=32)
    raws = [
        snappy.decompress(r.payload)
        for r in iter_records(open(path, "rb").read())
        if r.record_type == TYPE_COMPRESSED_BLOCK
    ]
    assert raws
    docs, forks = [], []
    for raw in raws:
        p = parse_block(raw, "gnosis", is_compressed=False, body_include=include)
        docs.append(p["data"])
        forks.append(p["version"])
    want = pa.array(docs, type=BLOCK_TYPE)

    coll = ColumnarBlockCollector(BLOCK_TYPE, include)
    for raw, fork in zip(raws, forks):
        coll.append(raw, fork)
    got = coll.flush()
    assert got.equals(want)
    assert len(coll) == 0  # flush resets


def test_spark_scan_differential(spark, tmp_path):
    """read_era_blocks(arrow_direct=True) row-identical to the dict path
    through the full Spark scan, mixed forks in one directory."""
    from era_parser_spark.sources.era import read_era_blocks

    d = str(tmp_path)
    for era in (1600, 2905):
        write_synthetic_era(
            os.path.join(d, era_filename("gnosis", era)), era, "gnosis", blocks=16
        )
    for tables in (["blocks"], ["attestations"], ["blocks", "attestations"]):
        fast = read_era_blocks(spark, d, glob="*.era", tables=tables).orderBy("slot").collect()
        slow = read_era_blocks(
            spark, d, glob="*.era", tables=tables, arrow_direct=False
        ).orderBy("slot").collect()
        assert fast == slow and len(fast) > 0, tables


def _valid_block(era: int = 1600) -> tuple[bytes, str]:
    """Encode one valid block via the schema encoder (the same round-trip
    machinery the SSZ suite pins); returns (bytes, fork)."""
    import copy

    from era_parser_spark.config.networks import fork_at_slot
    from era_parser_spark.testing.era_gen import make_block_doc

    slot = era * 8192
    fork = fork_at_slot(slot, "gnosis")
    doc = make_block_doc(slot, "gnosis")
    return encode_signed_block(copy.deepcopy(doc), fork), fork


def test_append_is_atomic_on_malformed_input():
    coll = ColumnarBlockCollector(BLOCK_TYPE, {"attestations"})
    good, fork = _valid_block()
    coll.append(good, fork)
    n_att = len(coll.a_slot)
    # truncated fixed part
    with pytest.raises(SSZError):
        coll.append(good[:50], fork)
    # message offset beyond the buffer
    bad = bytearray(good)
    bad[0:4] = (len(good) + 100).to_bytes(4, "little")
    with pytest.raises(SSZError):
        coll.append(bytes(bad), fork)
    # nothing partial leaked from the failures
    assert len(coll) == 1 and len(coll.a_slot) == n_att
    out = coll.flush()
    assert len(out) == 1


def test_malformed_attestation_list_raises_like_generic():
    """The same malformed attestation payloads must fail BOTH paths (the
    columnar path may be more permissive only for corruption in fields it
    does not read)."""
    from era_parser_spark.parsing.beacon import decode_signed_block

    good, fork = _valid_block()
    raw = bytearray(good)
    # find the attestations payload and wreck its offset table head
    # (body var offset @208 relative to body start)
    msg_off = int.from_bytes(raw[0:4], "little")
    body_off = int.from_bytes(raw[msg_off + 80 : msg_off + 84], "little")
    body_abs = msg_off + body_off
    att_rel = int.from_bytes(raw[body_abs + 208 : body_abs + 212], "little")
    att_abs = body_abs + att_rel
    raw[att_abs : att_abs + 4] = (3).to_bytes(4, "little")  # head not %4
    coll = ColumnarBlockCollector(BLOCK_TYPE, {"attestations"})
    with pytest.raises(SSZError):
        coll.append(bytes(raw), fork)
    with pytest.raises(SSZError):
        decode_signed_block(bytes(raw), fork, body_include={"attestations"})


def test_unknown_fork_fails_loudly_not_pre_electra():
    """A fork unknown to the columnar decoder (e.g. a future post-electra
    fork added to config/networks.py) must raise UnsupportedForkError when
    attestations are requested — NOT silently take the pre-electra branch
    and emit committee_bits as null."""
    from era_parser_spark.parsing.arrow_direct import UnsupportedForkError

    good, _fork = _valid_block()
    coll = ColumnarBlockCollector(BLOCK_TYPE, {"attestations"})
    with pytest.raises(UnsupportedForkError, match="arrow_direct=False"):
        coll.append(good, "fulu")
    # atomic: the failure left no partial state
    assert len(coll) == 0

    # header-only pruned scans share the layout across every fork — an
    # unknown fork is fine there (nothing layout-sensitive is read)
    coll2 = ColumnarBlockCollector(BLOCK_TYPE, {"graffiti"})
    coll2.append(good, "fulu")
    assert len(coll2) == 1 and len(coll2.flush()) == 1


def test_corrupt_blocks_skipped_identically_in_spark_scan(spark, tmp_path):
    """on_error='skip' must keep the scan alive on the columnar path too:
    corrupt one block record's payload, both paths parse n-1 blocks."""
    from era_parser_spark.sources.era import read_era_blocks

    d = str(tmp_path)
    path = os.path.join(d, era_filename("gnosis", 1600))
    write_synthetic_era(path, 1600, "gnosis", blocks=10)
    data = bytearray(open(path, "rb").read())
    # flip bytes mid-file to corrupt one compressed record's payload
    data[len(data) // 2 : len(data) // 2 + 64] = b"\xff" * 64
    with open(path, "wb") as f:
        f.write(data)
    fast = read_era_blocks(spark, d, glob="*.era", tables=["attestations"]).count()
    slow = read_era_blocks(
        spark, d, glob="*.era", tables=["attestations"], arrow_direct=False
    ).count()
    assert fast == slow < 10
