"""Deterministic synthetic era-file generator (test/bench data only).

Builds Beacon-API-shaped block documents for any fork, SSZ-encodes them via
the production schemas (parsing/beacon.py) and wraps them in e2store files.
Seeded RNG -> byte-identical fixtures across runs.
"""

from __future__ import annotations

import random

from era_parser_spark.config.networks import fork_at_slot, network_config
from era_parser_spark.parsing.beacon import encode_signed_block
from era_parser_spark.parsing.e2store import write_era


def _hex(rng: random.Random, n: int) -> str:
    return "0x" + bytes(rng.randrange(256) for _ in range(n)).hex()


def _checkpoint(rng, epoch):
    return {"epoch": epoch, "root": _hex(rng, 32)}


def _attestation_data(rng, slot):
    epoch = slot // 16
    return {
        "slot": max(slot - rng.randrange(1, 5), 0),
        "index": rng.randrange(4),
        "beacon_block_root": _hex(rng, 32),
        "source": _checkpoint(rng, max(epoch - 1, 0)),
        "target": _checkpoint(rng, epoch),
    }


def _attestation(rng, slot, electra=False):
    att = {
        "aggregation_bits": _hex(rng, rng.randrange(1, 17)),
        "data": _attestation_data(rng, slot),
        "signature": _hex(rng, 96),
    }
    if electra:
        att["committee_bits"] = _hex(rng, 8)
    return att


def _indexed_attestation(rng, slot, indices):
    return {
        "attesting_indices": indices,
        "data": _attestation_data(rng, slot),
        "signature": _hex(rng, 96),
    }


def _signed_header(rng, slot):
    return {
        "message": {
            "slot": slot,
            "proposer_index": rng.randrange(1 << 14),
            "parent_root": _hex(rng, 32),
            "state_root": _hex(rng, 32),
            "body_root": _hex(rng, 32),
        },
        "signature": _hex(rng, 96),
    }


def _payload(rng, slot, fork, network):
    cfg = network_config(network)
    doc = {
        "parent_hash": _hex(rng, 32),
        "fee_recipient": _hex(rng, 20),
        "state_root": _hex(rng, 32),
        "receipts_root": _hex(rng, 32),
        "logs_bloom": _hex(rng, 256),
        "prev_randao": _hex(rng, 32),
        "block_number": slot - 1000,
        "gas_limit": 30_000_000,
        "gas_used": rng.randrange(30_000_000),
        "timestamp": cfg["genesis_time"] + slot * cfg["seconds_per_slot"],
        "extra_data": _hex(rng, rng.randrange(33)) if rng.random() < 0.8 else "0x",
        "base_fee_per_gas": str(rng.randrange(1, 10**12)),
        "block_hash": _hex(rng, 32),
        "transactions": [_hex(rng, rng.randrange(40, 400)) for _ in range(rng.randrange(6))],
    }
    if fork in ("capella", "deneb", "electra"):
        doc["withdrawals"] = [
            {
                "index": slot * 4 + i,
                "validator_index": rng.randrange(1 << 14),
                "address": _hex(rng, 20),
                "amount": rng.randrange(1, 10**9),
            }
            for i in range(rng.randrange(5))
        ]
    if fork in ("deneb", "electra"):
        doc["blob_gas_used"] = rng.randrange(1 << 18)
        doc["excess_blob_gas"] = rng.randrange(1 << 18)
    return doc


def make_block_doc(slot: int, network: str = "gnosis", rng: random.Random | None = None) -> dict:
    """Beacon-API-shaped SignedBeaconBlock document for `slot`'s fork."""
    rng = rng or random.Random(slot)
    fork = fork_at_slot(slot, network)
    electra = fork == "electra"
    body = {
        "randao_reveal": _hex(rng, 96),
        "eth1_data": {
            "deposit_root": _hex(rng, 32),
            "deposit_count": rng.randrange(1 << 20),
            "block_hash": _hex(rng, 32),
        },
        "graffiti": _hex(rng, 32),
        "proposer_slashings": [
            _proposer_slashing(rng, slot) for _ in range(1 if rng.random() < 0.05 else 0)
        ],
        "attester_slashings": [
            _attester_slashing(rng, slot) for _ in range(1 if rng.random() < 0.05 else 0)
        ],
        "attestations": [
            _attestation(rng, slot, electra) for _ in range(rng.randrange(0, 8))
        ],
        "deposits": [_deposit(rng) for _ in range(1 if rng.random() < 0.1 else 0)],
        "voluntary_exits": [
            _voluntary_exit(rng, slot) for _ in range(1 if rng.random() < 0.05 else 0)
        ],
    }
    if fork != "phase0":
        body["sync_aggregate"] = {
            "sync_committee_bits": _hex(rng, 64),
            "sync_committee_signature": _hex(rng, 96),
        }
    if fork in ("bellatrix", "capella", "deneb", "electra"):
        body["execution_payload"] = _payload(rng, slot, fork, network)
    if fork in ("capella", "deneb", "electra"):
        body["bls_to_execution_changes"] = [
            _bls_change(rng) for _ in range(1 if rng.random() < 0.1 else 0)
        ]
    if fork in ("deneb", "electra"):
        body["blob_kzg_commitments"] = [_hex(rng, 48) for _ in range(rng.randrange(4))]
    if electra:
        body["execution_requests"] = {
            "deposits": [
                {
                    "pubkey": _hex(rng, 48),
                    "withdrawal_credentials": _hex(rng, 32),
                    "amount": rng.randrange(1, 10**10),
                    "signature": _hex(rng, 96),
                    "index": rng.randrange(1 << 20),
                }
                for _ in range(rng.randrange(3))
            ],
            "withdrawals": [
                {
                    "source_address": _hex(rng, 20),
                    "validator_pubkey": _hex(rng, 48),
                    "amount": rng.randrange(1, 10**10),
                }
                for _ in range(rng.randrange(3))
            ],
            "consolidations": [
                {
                    "source_address": _hex(rng, 20),
                    "source_pubkey": _hex(rng, 48),
                    "target_pubkey": _hex(rng, 48),
                }
                for _ in range(rng.randrange(2))
            ],
        }
    return {
        "message": {
            "slot": slot,
            "proposer_index": rng.randrange(1 << 14),
            "parent_root": _hex(rng, 32),
            "state_root": _hex(rng, 32),
            "body": body,
        },
        "signature": _hex(rng, 96),
    }


def _proposer_slashing(rng, slot):
    return {"signed_header_1": _signed_header(rng, slot), "signed_header_2": _signed_header(rng, slot)}


def _attester_slashing(rng, slot):
    common = sorted(rng.sample(range(1 << 14), 3))
    extra = sorted(rng.sample(range(1 << 14), 2))
    return {
        "attestation_1": _indexed_attestation(rng, slot, common),
        "attestation_2": _indexed_attestation(rng, slot, sorted(set(common[:2] + extra))),
    }


def _deposit(rng):
    return {
        "proof": [_hex(rng, 32) for _ in range(33)],
        "data": {
            "pubkey": _hex(rng, 48),
            "withdrawal_credentials": _hex(rng, 32),
            "amount": 32_000_000_000,
            "signature": _hex(rng, 96),
        },
    }


def _voluntary_exit(rng, slot):
    return {
        "message": {"epoch": slot // 16, "validator_index": rng.randrange(1 << 14)},
        "signature": _hex(rng, 96),
    }


def _bls_change(rng):
    return {
        "message": {
            "validator_index": rng.randrange(1 << 14),
            "from_bls_pubkey": _hex(rng, 48),
            "to_execution_address": _hex(rng, 20),
        },
        "signature": _hex(rng, 96),
    }


def write_synthetic_era(
    path: str,
    era_number: int,
    network: str = "gnosis",
    blocks: int = 64,
    missing_every: int = 9,
    seed: int = 42,
) -> list[dict]:
    """Write {network}-{era:05d}-{hash}.era with `blocks` slots of that era.

    Every `missing_every`-th slot is skipped (real chains miss slots), which
    exercises gap detection downstream.  Returns the block documents.
    """
    start = era_number * 8192
    docs, payloads = [], []
    for i in range(blocks):
        slot = start + i
        if missing_every and i % missing_every == missing_every - 1:
            continue
        doc = make_block_doc(slot, network, random.Random(seed * 1_000_003 + slot))
        fork = fork_at_slot(slot, network)
        docs.append(doc)
        payloads.append(encode_signed_block(doc, fork))
    data = write_era(payloads, state=b"\x00" * 256)
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return docs


def era_filename(network: str, era_number: int) -> str:
    return f"{network}-{era_number:05d}-deadbeef.era"
