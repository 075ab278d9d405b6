"""The reference's documented analytics workload (docs/CLICKHOUSE.md:340-905)
as DataFrame builders over the normalized 15-table model.

Each builder takes the table DataFrames it reads and returns the query plan;
`BEACON_ORACLES` holds the equivalent DuckDB SQL run against the same
warehouse parquet in tests (tests/test_beacon_analytics.py) — the full
differential loop on the engine's own data model.

Citations are reference doc lines; determinism conventions follow
docs/PLANS.md (integer-fed double arithmetic is exact; LIMITs carry total
orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from era_parser_spark.operators.sequence import gap_rows

BEACON_ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    BEACON_ORACLES[name] = sql


_oracle(
    "blocks_per_proposer",
    """
    SELECT proposer_index, count(*) AS blocks_proposed,
           min(timestamp_utc) AS first_block, max(timestamp_utc) AS last_block
    FROM blocks GROUP BY proposer_index
    ORDER BY blocks_proposed DESC, proposer_index LIMIT 20
    """,
)


def blocks_per_proposer(blocks: DataFrame) -> DataFrame:
    """Block production statistics (CLICKHOUSE.md:477-488)."""
    return (
        blocks.groupBy("proposer_index")
        .agg(
            F.count(F.lit(1)).alias("blocks_proposed"),
            F.min("timestamp_utc").alias("first_block"),
            F.max("timestamp_utc").alias("last_block"),
        )
        .orderBy(F.desc("blocks_proposed"), "proposer_index")
        .limit(20)
    )


_oracle(
    "missing_slots",
    """
    SELECT slot, prev_slot, slot - prev_slot - 1 AS missing_slots
    FROM (SELECT slot, lag(slot) OVER (ORDER BY slot) AS prev_slot FROM blocks)
    WHERE slot - prev_slot - 1 > 0
    """,
)


def missing_slots(blocks: DataFrame) -> DataFrame:
    """Missing-slots gap detection (CLICKHOUSE.md:501-509) via the
    distributed lag operator — one bucket per era (width 8192), so the
    window runs one task per era instead of one global task."""
    return gap_rows(
        blocks.select("slot"),
        "slot",
        bucket_width=8192,
        prev_col="prev_slot",
        gap_col="missing_slots",
    ).select("slot", "prev_slot", "missing_slots")


_oracle(
    "gas_utilization",
    """
    SELECT b.slot, ep.gas_limit, ep.gas_used,
           ep.gas_used * 100.0 / ep.gas_limit AS gas_utilization_percent,
           ep.base_fee_per_gas,
           count(t.transaction_hash) AS transaction_count
    FROM blocks b
    JOIN execution_payloads ep ON b.slot = ep.slot
    LEFT JOIN transactions t ON b.slot = t.slot
    WHERE ep.gas_used > 0
    GROUP BY b.slot, ep.gas_limit, ep.gas_used, ep.base_fee_per_gas
    ORDER BY gas_utilization_percent DESC, b.slot LIMIT 100
    """,
)


def gas_utilization(blocks: DataFrame, payloads: DataFrame, transactions: DataFrame) -> DataFrame:
    """Gas usage analysis (CLICKHOUSE.md:526-546): join blocks to payloads,
    left-count transactions per slot, rank by utilization."""
    ep = payloads.filter(F.col("gas_used") > 0).select(
        "slot", "gas_limit", "gas_used", "base_fee_per_gas"
    )
    tx_per_slot = transactions.groupBy("slot").agg(
        F.count("transaction_hash").alias("transaction_count")
    )
    return (
        blocks.select("slot")
        .join(ep, "slot")
        .join(tx_per_slot, "slot", "left")
        .withColumn("transaction_count", F.coalesce("transaction_count", F.lit(0)))
        .withColumn(
            "gas_utilization_percent", F.col("gas_used") * 100.0 / F.col("gas_limit")
        )
        .select(
            "slot", "gas_limit", "gas_used", "gas_utilization_percent",
            "base_fee_per_gas", "transaction_count",
        )
        .orderBy(F.desc("gas_utilization_percent"), "slot")
        .limit(100)
    )


_oracle(
    "tx_share_by_fee_recipient",
    """
    SELECT fee_recipient, count(*) AS transactions,
           count(*) * 100.0 / sum(count(*)) OVER () AS percentage,
           avg(gas_limit) AS avg_gas_limit
    FROM transactions GROUP BY fee_recipient
    ORDER BY transactions DESC, fee_recipient LIMIT 20
    """,
)


def tx_share_by_fee_recipient(transactions: DataFrame) -> DataFrame:
    """Transaction volume + percent-of-total (CLICKHOUSE.md:513-524)."""
    g = transactions.groupBy("fee_recipient").agg(
        F.count(F.lit(1)).alias("transactions"),
        F.avg("gas_limit").alias("avg_gas_limit"),
    )
    return (
        g.withColumn(
            "percentage",
            F.col("transactions") * 100.0 / F.sum("transactions").over(W.partitionBy()),
        )
        .select("fee_recipient", "transactions", "percentage", "avg_gas_limit")
        .orderBy(F.desc("transactions"), "fee_recipient")
        .limit(20)
    )


_oracle(
    "withdrawals_conform_union",
    """
    SELECT 'traditional_withdrawals' AS withdrawal_type,
           CAST(date_trunc('day', timestamp_utc) AS TIMESTAMP) AS day,
           count(*) AS withdrawal_count, sum(amount) AS total_withdrawn_gwei,
           count(DISTINCT validator_index) AS unique_validators
    FROM withdrawals GROUP BY 2
    UNION ALL
    SELECT 'withdrawal_requests' AS withdrawal_type,
           CAST(date_trunc('day', timestamp_utc) AS TIMESTAMP) AS day,
           count(*) AS withdrawal_count, sum(amount) AS total_withdrawn_gwei,
           count(DISTINCT validator_pubkey) AS unique_validators
    FROM withdrawal_requests GROUP BY 2
    """,
)


def withdrawals_conform_union(withdrawals: DataFrame, withdrawal_requests: DataFrame) -> DataFrame:
    """Traditional-vs-request withdrawals comparison (CLICKHOUSE.md:553-580)."""
    a = (
        withdrawals.groupBy(F.date_trunc("day", "timestamp_utc").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("withdrawal_count"),
            F.sum("amount").alias("total_withdrawn_gwei"),
            F.countDistinct("validator_index").alias("unique_validators"),
        )
        .select(F.lit("traditional_withdrawals").alias("withdrawal_type"), "*")
    )
    b = (
        withdrawal_requests.groupBy(F.date_trunc("day", "timestamp_utc").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("withdrawal_count"),
            F.sum("amount").alias("total_withdrawn_gwei"),
            F.countDistinct("validator_pubkey").alias("unique_validators"),
        )
        .select(F.lit("withdrawal_requests").alias("withdrawal_type"), "*")
    )
    return a.unionByName(b)


_oracle(
    "attestation_participation",
    """
    SELECT committee_index, count(*) AS attestations,
           count(DISTINCT attestation_slot) AS slots_attested,
           count(DISTINCT slot) AS inclusion_slots,
           avg(slot - attestation_slot) AS avg_inclusion_delay
    FROM attestations GROUP BY committee_index
    ORDER BY attestations DESC, committee_index
    """,
)


def attestation_participation(attestations: DataFrame) -> DataFrame:
    """Attestation participation + inclusion delay (CLICKHOUSE.md:603-613)."""
    return (
        attestations.groupBy("committee_index")
        .agg(
            F.count(F.lit(1)).alias("attestations"),
            F.countDistinct("attestation_slot").alias("slots_attested"),
            F.countDistinct("slot").alias("inclusion_slots"),
            F.avg(F.col("slot") - F.col("attestation_slot")).alias("avg_inclusion_delay"),
        )
        .orderBy(F.desc("attestations"), "committee_index")
    )


_oracle(
    "sync_participation_daily",
    """
    SELECT day, sync_count, avg_participation,
           sqrt(greatest(mean_sq - avg_participation * avg_participation, 0.0))
             AS participation_stddev
    FROM (
      SELECT CAST(date_trunc('day', timestamp_utc) AS TIMESTAMP) AS day,
             count(*) AS sync_count,
             sum(participating_validators) * 1.0 / count(*) AS avg_participation,
             sum(participating_validators * participating_validators) * 1.0
               / count(*) AS mean_sq
      FROM sync_aggregates GROUP BY 1
    )
    """,
)


def sync_participation_daily(sync_aggregates: DataFrame) -> DataFrame:
    """Sync-committee efficiency per day with stddevPop
    (CLICKHOUSE.md:641-649) — exact integer sums, deterministic."""
    pv = F.col("participating_validators")
    g = sync_aggregates.groupBy(
        F.date_trunc("day", "timestamp_utc").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("sync_count"),
        (F.sum(pv) * 1.0 / F.count(F.lit(1))).alias("avg_participation"),
        (F.sum(pv * pv) * 1.0 / F.count(F.lit(1))).alias("mean_sq"),
    )
    return g.select(
        "day",
        "sync_count",
        "avg_participation",
        F.sqrt(
            F.greatest(
                F.col("mean_sq") - F.col("avg_participation") * F.col("avg_participation"),
                F.lit(0.0),
            )
        ).alias("participation_stddev"),
    )


_oracle(
    "slashing_classification",
    """
    SELECT slot, att_1_target_epoch, att_2_target_epoch,
           total_slashed_validators,
           CASE WHEN att_1_target_epoch = att_2_target_epoch THEN 'Double Vote'
                WHEN att_1_source_epoch < att_2_source_epoch
                 AND att_1_target_epoch > att_2_target_epoch THEN 'Surround Vote'
                ELSE 'Other' END AS slashing_type
    FROM attester_slashings
    """,
)


def slashing_classification(attester_slashings: DataFrame) -> DataFrame:
    """Double/Surround Vote classification (CLICKHOUSE.md:676-693)."""
    t = (
        F.when(F.col("att_1_target_epoch") == F.col("att_2_target_epoch"), "Double Vote")
        .when(
            (F.col("att_1_source_epoch") < F.col("att_2_source_epoch"))
            & (F.col("att_1_target_epoch") > F.col("att_2_target_epoch")),
            "Surround Vote",
        )
        .otherwise("Other")
    )
    return attester_slashings.select(
        "slot",
        "att_1_target_epoch",
        "att_2_target_epoch",
        "total_slashed_validators",
        t.alias("slashing_type"),
    )


def validator_slashed_lookup(attester_slashings: DataFrame, validator_index: int) -> DataFrame:
    """Array-membership over the JSON-string index lists
    (CLICKHOUSE.md:703-710: has(JSONExtract(...), v))."""
    def has(colname):
        return F.array_contains(
            F.from_json(F.col(colname), "array<bigint>"), F.lit(validator_index)
        )

    return attester_slashings.filter(
        has("att_1_attesting_indices") | has("att_2_attesting_indices")
    ).select(
        "slot", "slashing_index", "att_1_validator_count", "att_2_validator_count",
        "total_slashed_validators", "timestamp_utc",
    )


def validator_slashed_lookup_oracle(validator_index: int) -> str:
    return f"""
    SELECT slot, slashing_index, att_1_validator_count, att_2_validator_count,
           total_slashed_validators, timestamp_utc
    FROM attester_slashings
    WHERE list_contains(CAST(att_1_attesting_indices AS BIGINT[]), {validator_index})
       OR list_contains(CAST(att_2_attesting_indices AS BIGINT[]), {validator_index})
    """


_oracle(
    "bls_change_addresses",
    """
    SELECT validator_index, count(*) AS change_count,
           string_agg(to_execution_address, ',' ORDER BY to_execution_address)
             AS execution_addresses,
           min(timestamp_utc) AS first_change, max(timestamp_utc) AS last_change
    FROM bls_changes GROUP BY validator_index
    """,
)


def bls_change_addresses(bls_changes: DataFrame) -> DataFrame:
    """groupArray of execution addresses per validator (CLICKHOUSE.md:736-744),
    rendered sorted-joined for deterministic comparison."""
    return bls_changes.groupBy("validator_index").agg(
        F.count(F.lit(1)).alias("change_count"),
        F.array_join(F.array_sort(F.collect_list("to_execution_address")), ",").alias(
            "execution_addresses"
        ),
        F.min("timestamp_utc").alias("first_change"),
        F.max("timestamp_utc").alias("last_change"),
    )


_oracle(
    "requests_full_outer",
    """
    WITH d AS (SELECT slot, count(*) AS deposit_requests FROM deposit_requests GROUP BY slot),
         w AS (SELECT slot, count(*) AS withdrawal_requests FROM withdrawal_requests GROUP BY slot),
         c AS (SELECT slot, count(*) AS consolidation_requests FROM consolidation_requests GROUP BY slot)
    SELECT coalesce(d.slot, w.slot, c.slot) AS slot,
           d.deposit_requests, w.withdrawal_requests, c.consolidation_requests
    FROM d FULL OUTER JOIN w ON d.slot = w.slot
           FULL OUTER JOIN c ON coalesce(d.slot, w.slot) = c.slot
    """,
)


def requests_full_outer(
    deposit_requests: DataFrame,
    withdrawal_requests: DataFrame,
    consolidation_requests: DataFrame,
) -> DataFrame:
    """Cross-request-type per-slot comparison via full outer joins
    (CLICKHOUSE.md:798-809)."""
    d = deposit_requests.groupBy("slot").agg(F.count(F.lit(1)).alias("deposit_requests"))
    w = withdrawal_requests.groupBy("slot").agg(
        F.count(F.lit(1)).alias("withdrawal_requests")
    )
    c = consolidation_requests.groupBy("slot").agg(
        F.count(F.lit(1)).alias("consolidation_requests")
    )
    dw = d.join(w, d.slot == w.slot, "full_outer").select(
        F.coalesce(d.slot, w.slot).alias("slot"), "deposit_requests", "withdrawal_requests"
    )
    return dw.join(c, dw.slot == c.slot, "full_outer").select(
        F.coalesce(dw.slot, c.slot).alias("slot"),
        "deposit_requests",
        "withdrawal_requests",
        "consolidation_requests",
    )


_oracle(
    "request_type_totals",
    """
    SELECT 'deposit_requests' AS request_type, count(*) AS total_requests,
           sum(amount) AS total_amount_gwei, count(DISTINCT pubkey) AS unique_keys
    FROM deposit_requests
    UNION ALL
    SELECT 'withdrawal_requests', count(*), sum(amount),
           count(DISTINCT validator_pubkey)
    FROM withdrawal_requests
    UNION ALL
    SELECT 'consolidation_requests', count(*), 0, count(DISTINCT source_pubkey)
    FROM consolidation_requests
    """,
)


def request_type_totals(
    deposit_requests: DataFrame,
    withdrawal_requests: DataFrame,
    consolidation_requests: DataFrame,
) -> DataFrame:
    """Cross-request-type UNION ALL totals (CLICKHOUSE.md:425-459)."""
    d = deposit_requests.agg(
        F.count(F.lit(1)).alias("total_requests"),
        F.sum("amount").alias("total_amount_gwei"),
        F.countDistinct("pubkey").alias("unique_keys"),
    ).select(F.lit("deposit_requests").alias("request_type"), "*")
    w = withdrawal_requests.agg(
        F.count(F.lit(1)).alias("total_requests"),
        F.sum("amount").alias("total_amount_gwei"),
        F.countDistinct("validator_pubkey").alias("unique_keys"),
    ).select(F.lit("withdrawal_requests").alias("request_type"), "*")
    c = consolidation_requests.agg(
        F.count(F.lit(1)).alias("total_requests"),
        F.lit(0).cast("long").alias("total_amount_gwei"),
        F.countDistinct("source_pubkey").alias("unique_keys"),
    ).select(F.lit("consolidation_requests").alias("request_type"), "*")
    return d.unionByName(w).unionByName(c)


_oracle(
    "blob_hourly",
    """
    SELECT hour, total_commitments, blocks_with_blobs,
           avg(total_commitments) OVER () AS avg_hourly_commitments
    FROM (
      SELECT CAST(date_trunc('hour', timestamp_utc) AS TIMESTAMP) AS hour,
             count(*) AS total_commitments, count(DISTINCT slot) AS blocks_with_blobs
      FROM blob_commitments GROUP BY 1
    )
    """,
)


def blob_hourly(blob_commitments: DataFrame) -> DataFrame:
    """Blob commitment patterns with whole-relation average
    (CLICKHOUSE.md:750-757)."""
    g = blob_commitments.groupBy(
        F.date_trunc("hour", "timestamp_utc").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("total_commitments"),
        F.countDistinct("slot").alias("blocks_with_blobs"),
    )
    return g.select(
        "hour",
        "total_commitments",
        "blocks_with_blobs",
        F.avg("total_commitments").over(W.partitionBy()).alias("avg_hourly_commitments"),
    )


_oracle(
    "exits_monthly",
    """
    SELECT CAST(date_trunc('month', timestamp_utc) AS TIMESTAMP) AS month,
           count(*) AS exit_count, count(DISTINCT validator_index) AS unique_validators
    FROM voluntary_exits GROUP BY 1
    """,
)


def exits_monthly(voluntary_exits: DataFrame) -> DataFrame:
    """Voluntary exits per month (CLICKHOUSE.md:617-624)."""
    return voluntary_exits.groupBy(
        F.date_trunc("month", "timestamp_utc").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("exit_count"),
        F.countDistinct("validator_index").alias("unique_validators"),
    )


# table names each builder consumes, in argument order (drives the tests)
BEACON_QUERIES: dict[str, tuple] = {
    "blocks_per_proposer": (blocks_per_proposer, ("blocks",)),
    "missing_slots": (missing_slots, ("blocks",)),
    "gas_utilization": (gas_utilization, ("blocks", "execution_payloads", "transactions")),
    "tx_share_by_fee_recipient": (tx_share_by_fee_recipient, ("transactions",)),
    "withdrawals_conform_union": (
        withdrawals_conform_union,
        ("withdrawals", "withdrawal_requests"),
    ),
    "attestation_participation": (attestation_participation, ("attestations",)),
    "sync_participation_daily": (sync_participation_daily, ("sync_aggregates",)),
    "slashing_classification": (slashing_classification, ("attester_slashings",)),
    "bls_change_addresses": (bls_change_addresses, ("bls_changes",)),
    "requests_full_outer": (
        requests_full_outer,
        ("deposit_requests", "withdrawal_requests", "consolidation_requests"),
    ),
    "request_type_totals": (
        request_type_totals,
        ("deposit_requests", "withdrawal_requests", "consolidation_requests"),
    ),
    "blob_hourly": (blob_hourly, ("blob_commitments",)),
    "exits_monthly": (exits_monthly, ("voluntary_exits",)),
}
