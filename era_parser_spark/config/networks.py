"""Public beacon-chain network parameters (consensus-spec constants).

Values match the reference's config (era_parser/config/networks.py:1-41,
config/forks.py:63-81) which in turn mirror the published chain configs for
mainnet / gnosis / sepolia.
"""

from __future__ import annotations

import re

SLOTS_PER_HISTORICAL_ROOT = 8192  # one era = 8192 slots

FORKS = ("phase0", "altair", "bellatrix", "capella", "deneb", "electra")

NETWORKS: dict[str, dict] = {
    "mainnet": {
        "genesis_time": 1606824023,
        "seconds_per_slot": 12,
        "slots_per_epoch": 32,
        "fork_epochs": {
            "altair": 74240,
            "bellatrix": 144896,
            "capella": 194048,
            "deneb": 269568,
            "electra": 364032,
        },
    },
    "gnosis": {
        "genesis_time": 1638993340,
        "seconds_per_slot": 5,
        "slots_per_epoch": 16,
        "fork_epochs": {
            "altair": 512,
            "bellatrix": 385536,
            "capella": 648704,
            "deneb": 889856,
            "electra": 1337856,
        },
    },
    "sepolia": {
        "genesis_time": 1655733600,
        "seconds_per_slot": 12,
        "slots_per_epoch": 32,
        "fork_epochs": {
            "altair": 50,
            "bellatrix": 100,
            "capella": 56832,
            "deneb": 132608,
            "electra": 222464,
        },
    },
}

_ERA_FILENAME = re.compile(r"(?P<network>[a-z0-9]+)-(?P<era>\d{5})-(?P<hash>[0-9a-f]+)\.era$")


def network_config(name: str) -> dict:
    try:
        return NETWORKS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown network {name!r}; known: {sorted(NETWORKS)}") from None


def fork_at_slot(slot: int, network: str = "mainnet") -> str:
    """Fork name active at `slot` (epoch compared against fork epochs)."""
    cfg = network_config(network)
    epoch = slot // cfg["slots_per_epoch"]
    current = "phase0"
    for fork in FORKS[1:]:
        if epoch >= cfg["fork_epochs"][fork]:
            current = fork
    return current


def slot_timestamp(slot: int, network: str = "mainnet") -> int:
    """Wall-clock (epoch seconds) of a slot from genesis time."""
    cfg = network_config(network)
    return cfg["genesis_time"] + slot * cfg["seconds_per_slot"]


def era_number_for_slot(slot: int) -> int:
    return slot // SLOTS_PER_HISTORICAL_ROOT


def era_slot_range(era: int) -> tuple[int, int]:
    start = era * SLOTS_PER_HISTORICAL_ROOT
    return start, start + SLOTS_PER_HISTORICAL_ROOT - 1


def parse_era_filename(path: str) -> dict | None:
    """{network}-{era:05d}-{hash8}.era -> parts, or None if non-conforming."""
    m = _ERA_FILENAME.search(path.lower())
    if not m:
        return None
    return {
        "network": m.group("network"),
        "era_number": int(m.group("era")),
        "short_hash": m.group("hash"),
    }


def detect_network(path: str) -> str:
    """Network from filename; mirrors the reference's substring fallback."""
    parsed = parse_era_filename(path)
    if parsed and parsed["network"] in NETWORKS:
        return parsed["network"]
    low = path.lower()
    for name in NETWORKS:
        if name in low:
            return name
    return "mainnet"
