"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's built-in approx_count_distinct (HyperLogLog++) is
implementation-defined, so its estimates can only be rows-only checked
(x8).  KMV (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") is just as mergeable and one-pass, but its state — the k smallest
hash values — is a pure function of the input set, so the ESTIMATE itself
is reproducible bit-for-bit in plain SQL: an oracle-exact sketch.

Estimator: with h uniform on [0, 2^60) and kth = the k-th smallest
distinct hash, E[distinct] ~ (k-1) * 2^60 / kth; groups with fewer than k
distinct values report their exact count (the sketch IS the set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POW60 = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
    buckets: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_tracked, kth_min,
    est_distinct).

    Hash: the 60-bit md5 int (positive in a signed BIGINT in any engine —
    the dd4b trick).  The k smallest per group are found in two all-JVM
    phases so no single task ever materializes a group's full distinct
    set:

    1. per (group, h % buckets) salt cell: sort_array(collect_set)[:k] —
       collect_set dedups (map-side too), so this is the ONLY shuffle and
       it carries partial hash sets, not rows; a value that is globally
       top-k smallest is top-k within its cell, so the union of cell
       top-ks contains the answer; per-cell memory is ~distinct/buckets
       (size `buckets` for the corpus, the same salting lever as x10);
    2. merge: explode the <= buckets*k survivors per group and take the k
       smallest — tiny.

    (k-1)*2^60 is exact in a double for k <= ~2^9 and kth < 2^60 is
    exactly representable, so the final division is one correctly-rounded
    IEEE op — the estimate matches SQL bit-for-bit.
    """
    from era_parser_spark.operators.dedup import md5_60bit

    h = md5_60bit(F.col(value_col).cast("string")).alias("__h")
    cells = (
        df.select(F.col(group_col), h)
        .groupBy(group_col, F.pmod(F.col("__h"), F.lit(buckets)).alias("__c"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__ks"))
    )
    merged = (
        cells.select(F.col(group_col), F.explode("__ks").alias("__h"))
        .groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("__ks"))
    )
    m = F.size("__ks")
    kth = F.element_at("__ks", m)
    num = float((k - 1) * _POW60)
    return merged.select(
        F.col(group_col),
        m.cast("long").alias("n_tracked"),
        kth.alias("kth_min"),
        F.when(m < k, m.cast("double"))
        .otherwise(F.lit(num) / kth.cast("double"))
        .alias("est_distinct"),
    )


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch cells over a value column — the mergeable
    frequency summary (Cormode & Muthukrishnan 2005): depth independent
    hash rows of `width` counters; est(v) = min over rows of
    cell[j][h_j(v)], an overestimate only (collisions add, never
    subtract).

    Deterministic md5-derived row hashes (h_j(v) = 60-bit md5 of
    'j:value' mod width) make the ENTIRE sketch a pure function of the
    multiset — so the cell table is oracle-EXACT, the same argument as
    x12's KMV.  At 100 TB the sketch is the point: depth*width counters
    summarize any cardinality, partial sketches from every partition
    merge by cell-wise addition (one map-side-combined shuffle of at most
    depth*width rows per partition), and two corpora's sketches merge the
    same way without touching raw data again.

    Output: (row, col, cnt) — only nonzero cells, depth*width upper
    bound.  `estimate_countmin` (driver-side, tiny) answers point
    queries from the collected cells.
    """
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(countmin_cells_expr(value_col, depth, width)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_cells_expr(value_col: str, depth: int = 4, width: int = 64):
    """The per-row array of (row, col) sketch cells — shared by the batch
    aggregate above and the streaming twin (st7), so the two paths can
    never hash differently."""
    from era_parser_spark.operators.dedup import md5_60bit

    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(
                    md5_60bit(
                        F.concat(F.lit(f"{j}:"), F.col(value_col).cast("string"))
                    ),
                    F.lit(width),
                ).alias("col"),
            )
            for j in range(depth)
        ]
    )


def estimate_countmin(
    cells: list, value, depth: int = 4, width: int = 64
) -> int:
    """Point-frequency estimate from collected sketch cells (driver-side;
    `cells` is the tiny (row, col, cnt) list countmin_sketch produced).
    Guaranteed >= the true count; equality when no collisions hit all
    depth rows.

    `value` must be a str or int: those are the types whose Python str()
    matches Spark's cast-to-string byte-for-byte, which the >= guarantee
    depends on.  Booleans/decimals/timestamps render differently
    ('True' vs 'true', trailing zeros, ...) and would probe the wrong
    cells — cast such columns to string JVM-side before sketching and
    query with the same string.
    """
    import hashlib

    if not isinstance(value, (str, int)) or isinstance(value, bool):
        raise TypeError(
            f"estimate_countmin value must be str or int, got {type(value).__name__}"
        )
    table = {(r, c): n for r, c, n in cells}
    est = None
    for j in range(depth):
        h = int(
            hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:15], 16
        ) % width
        v = table.get((j, h), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def bloom_positions_expr(value_col, m_bits: int = 4096, k: int = 4) -> list:
    """The k md5-derived Bloom bit positions of one value — shared by the
    build (bloom_bits) and probe (bloom_probe_sql) paths so they can never
    hash apart.  Position j = 60-bit md5 of 'j:value' mod m_bits, the same
    hash family as the count-min rows."""
    from era_parser_spark.operators.dedup import md5_60bit

    col = F.col(value_col) if isinstance(value_col, str) else value_col
    return [
        F.pmod(
            md5_60bit(F.concat(F.lit(f"{j}:"), col.cast("string"))), F.lit(m_bits)
        )
        for j in range(k)
    ]


def bloom_bits(df: DataFrame, value_col: str, m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Set bit positions (bit BIGINT) of a Bloom filter over a column
    (Bloom 1970) — the mergeable membership summary.

    Deterministic md5-derived positions make the bit set a pure function
    of the VALUE SET — so unlike a library bloom filter the whole state
    is oracle-exact, the same argument as x12's KMV and x23's count-min.
    Mergeable by plain union/distinct; the shuffle carries at most
    min(k * distinct values, m_bits) rows of one BIGINT (map-side
    distinct), never the values themselves."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(F.array(*bloom_positions_expr(value_col, m_bits, k))).alias("bit"))
        .distinct()
    )


def bloom_words(bits: DataFrame, m_bits: int = 4096) -> DataFrame:
    """Pack a (bit,) set into ONE row holding the full filter as
    array<bigint> `words` (little-endian: bit b lives in word b div 64 at
    offset b % 64) — the broadcastable probe-side representation.
    m_bits/8 bytes regardless of input cardinality: 2^18 bits = 32 KB.

    Distinct offsets within a word make sum(1<<offset) equal the bitwise
    OR (no carries), so the pack is a plain map-side-combined aggregate.
    """
    n_words = (m_bits + 63) // 64
    per_word = (
        bits.select(
            F.expr("cast(bit div 64 as int)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(bit % 64 as int))").alias("v"),
        )
        .groupBy("w")
        .agg(F.sum("v").alias("v"))
    )
    return (
        per_word.agg(
            F.map_from_entries(F.collect_list(F.struct("w", "v"))).alias("wm")
        ).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(F.element_at(F.col("wm"), i), F.lit(0).cast("bigint")),
            ).alias("words")
        )
    )


def bloom_probe_sql(words_col: str, value_col: str, m_bits: int = 4096, k: int = 4) -> str:
    """Boolean SQL expression: value's k Bloom positions are ALL set in the
    packed `words` array — true membership always probes true; a false
    positive requires all k positions colliding (p ~ (set_bits/m)^k).
    Built as a SQL string because PySpark's shiftright() only takes a
    literal shift amount; everything stays codegen."""
    checks = []
    for j in range(k):
        pos = (
            f"pmod(cast(conv(substring(md5(cast(concat('{j}:', cast({value_col} as string)) as binary)), 1, 15), 16, 10) as bigint), {m_bits})"
        )
        checks.append(
            f"((shiftright(element_at({words_col}, cast(({pos}) div 64 as int) + 1), cast(({pos}) % 64 as int)) & 1) = 1)"
        )
    return "(" + " AND ".join(checks) + ")"


def _kmv_one_row(df: DataFrame, value_col: str, k: int, buckets: int):
    """Single-set KMV: the k smallest distinct 60-bit md5 hashes of a
    column, as ONE (m, kth, ks) row — kmv_distinct's two salted all-JVM
    phases without the group key."""
    from era_parser_spark.operators.dedup import md5_60bit

    h = md5_60bit(F.col(value_col).cast("string")).alias("__h")
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .select(h)
        .groupBy(F.pmod(F.col("__h"), F.lit(buckets)).alias("__c"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__ks"))
    )
    return (
        cells.select(F.explode("__ks").alias("__h"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("ks"))
    )


def kmv_intersection(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 32,
    buckets: int = 16,
) -> DataFrame:
    """Theta-sketch-style set overlap from two KMV sketches (Dasgupta et
    al., the DataSketches theta family): estimate |A∩B|, |A∪B| and the
    Jaccard of two distinct-value sets while shuffling only k hashes per
    side — the audience-overlap / cross-corpus-contamination estimator at
    100 TB (exact answers need a full |A∪B| shuffle; this needs two
    one-row sketches).

    theta = min over sides of (kth smallest hash, or 2^60 if the side
    holds fewer than k distinct values); every sketch hash below theta is
    a uniform sample of the union, so

        est_inter = |sketchA ∩ sketchB below theta| * 2^60 / theta
        est_union = |sketchA ∪ sketchB below theta| * 2^60 / theta
        jaccard_est = inter_size / union_size

    Unsaturated sides degrade gracefully: theta = 2^60 makes both
    estimates exact counts.  Like x12, every quantity is a pure function
    of the value sets (md5 hashes, integer counts) and each estimate is
    ONE correctly-rounded IEEE division on exactly-representable doubles
    (counts <= 2k, 2^60 a power of two, theta < 2^60 integral) — so the
    whole operator is oracle-EXACT.  Sketches are mergeable (array_union
    + re-truncate), the DataSketches property that lets partial sketches
    roll up across partitions and days.
    """
    ka = _kmv_one_row(a, value_col, k, buckets).select(F.col("ks").alias("ka"))
    kb = _kmv_one_row(b, value_col, k, buckets).select(F.col("ks").alias("kb"))
    pow60 = F.lit(float(_POW60))
    side_theta = lambda c: F.when(  # noqa: E731
        F.size(c) < k, F.lit(_POW60).cast("long")
    ).otherwise(F.element_at(c, F.size(c)))
    j = ka.crossJoin(kb).select(
        "ka",
        "kb",
        F.least(side_theta(F.col("ka")), side_theta(F.col("kb"))).alias("theta"),
    )
    below = lambda arr: F.filter(arr, lambda x: x < F.col("theta"))  # noqa: E731
    sized = j.select(
        "theta",
        F.size(below(F.array_intersect("ka", "kb"))).alias("n_common"),
        F.size(below(F.array_union("ka", "kb"))).alias("union_size"),
    )
    return sized.select(
        F.col("n_common").cast("long").alias("n_common"),
        F.col("union_size").cast("long").alias("union_size"),
        "theta",
        (F.col("n_common").cast("double") * pow60 / F.col("theta").cast("double"))
        .alias("est_intersection"),
        (F.col("union_size").cast("double") * pow60 / F.col("theta").cast("double"))
        .alias("est_union"),
        F.when(F.col("union_size") == 0, F.lit(0.0))
        .otherwise(F.col("n_common").cast("double") / F.col("union_size").cast("double"))
        .alias("jaccard_est"),
    )


_HLL_ALPHA_NUM: dict[int, float] = {}


def _hll_shift(p: int) -> int:
    """The harmonic-sum scaling exponent: w = h >> p has 60-p bits, so
    rho ranges 1..(60-p)+1 and 2^(61-p-rho) is integral for every
    register value — 51 at the default p=10.  EVERY bit constant in
    the HLL pair derives from this (the p!=10-silently-biased review
    finding)."""
    return 61 - p


def _hll_numerator(m: int, p: int) -> float:
    """alpha_m * m^2 * 2^shift as ONE Python float, embedded verbatim
    on both engine sides so the raw estimate is a single identical IEEE
    division (m^2 * 2^shift is a power of two — exactly representable;
    the product is computed once HERE, not re-derived per engine)."""
    key = (m, p)
    if key not in _HLL_ALPHA_NUM:
        alpha = 0.7213 / (1 + 1.079 / m)
        _HLL_ALPHA_NUM[key] = alpha * (m * m) * float(1 << _hll_shift(p))
    return _HLL_ALPHA_NUM[key]


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet et al. 2007) with a FULLY
    DETERMINISTIC register state — the oracle-exact twin of Spark's
    opaque approx_count_distinct (x8), the way x12's KMV is, but with
    HLL's O(m) state instead of KMV's O(k) mins.

    Hash split: the 60-bit md5 int's low p bits are the register index
    (``h & (m-1)`` == pmod, m a power of two) and the high 50 bits are
    ``w = h >> p`` — exact bit ops in both engines.  rho(w) = leading
    zeros in the 50-bit w + 1 = 51 - bitlen(w), where bitlen is the
    LENGTH OF THE BINARY STRING (Spark ``bin()`` / DuckDB
    ``ltrim(bin(),'0')`` — integer-exact, no log2 double).

    Estimator: raw = alpha_m*m^2 / sum_j 2^-M_j.  The harmonic sum is
    kept in EXACT BIGINT by scaling with 2^51: present registers
    contribute 2^(51-rho), the (m - n_present) empty ones 2^51 each —
    no float summation-order dependence.  Small-range correction
    (raw <= 2.5m and empty registers exist) switches to linear counting
    m*ln(m/V); ln is the one non-exact op, so ``est_distinct`` is
    rounded to 2 decimals (a last-ulp libm divergence flipping a
    centi-boundary is the same accepted-risk class as 64-bit hash
    collisions).  ``est_raw`` stays unrounded — it is bit-deterministic.
    The 60-bit hash space makes large-range correction unreachable.

    Plan: ONE map-side-combined (group, j, max rho) shuffle — register
    rows, never values; registers merge by MAX, so sketches are
    mergeable across partitions/streams by construction.

    Returns (group, n_present_registers, n_zero_registers, est_raw,
    est_distinct).
    """
    from era_parser_spark.operators.dedup import md5_60bit

    m = 1 << p
    sh = _hll_shift(p)
    h = md5_60bit(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    bits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = (F.lit(sh) - bits).alias("__rho")
    regs = (
        # NULL values are excluded, matching count(DISTINCT)'s contract
        # (a NULL hash would otherwise mint a phantom register counted
        # present but contributing nothing to the harmonic sum)
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.pmod(h, F.lit(m)).alias("__j"), rho)
        .groupBy(group_col, "__j")
        .agg(F.max("__rho").alias("__r"))
    )
    per = regs.groupBy(group_col).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({sh} - __r AS INT))")
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("n_present_registers"),
    )
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("n_present_registers")) * F.lit(1 << sh)
    )
    v = (F.lit(m) - F.col("n_present_registers")).alias("n_zero_registers")
    est_raw = F.lit(_hll_numerator(m, p)) / s_total.cast("double")
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_zero_registers").cast("double")
    )
    return per.select(
        F.col(group_col),
        F.col("n_present_registers"),
        v,
        est_raw.alias("est_raw"),
        F.round(
            F.when(
                (est_raw <= F.lit(2.5 * m)) & (F.col("n_zero_registers") > 0),
                linear,
            ).otherwise(est_raw),
            2,
        ).alias("est_distinct"),
    )


def hll_sliding_distinct(
    df: DataFrame,
    day_col: Column,
    value_col: str,
    p: int = 10,
    window_days: int = 3,
) -> DataFrame:
    """Trailing-window distinct-count estimates from MERGED daily HLL
    sketches — the demonstration that x33's registers are an ALGEBRA,
    not just an aggregate: a day's sketch is built once and every
    window containing that day reuses it by register-wise MAX, which is
    how a production rollup serves "distinct users, trailing N days"
    without re-scanning N days of raw events.

    Plan: one (day, register) shuffle builds the daily sketches (rows =
    days x m, independent of event volume); each daily register row is
    replicated to the <= window_days target days it serves (explode of
    a day-offset array — tiny, register-level), then a second
    map-side-combined MAX merge per (target_day, register).  Raw values
    shuffle ONCE, at daily-sketch build.  Windows at the head of the
    range merge fewer days (partial trailing window, the standard
    rollup convention); target days with no events in-window don't
    appear.

    Same estimator and exactness story as hll_distinct (shared rho /
    harmonic-sum rules).  Returns (day, n_present_registers,
    n_zero_registers, est_raw, est_distinct).
    """
    from era_parser_spark.operators.dedup import md5_60bit

    m = 1 << p
    sh = _hll_shift(p)
    h = md5_60bit(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    bits = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            day_col.alias("day"),
            F.pmod(h, F.lit(m)).alias("__j"),
            (F.lit(sh) - bits).alias("__rho"),
        )
        .groupBy("day", "__j")
        .agg(F.max("__rho").alias("__r"))
    )
    fanned = daily.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(window_days - 1)),
                lambda k: F.date_add(F.col("day"), k),
            )
        ).alias("day_t"),
        "day",
        "__j",
        "__r",
    )
    merged = fanned.groupBy("day_t", "__j").agg(F.max("__r").alias("__r"))
    per = merged.groupBy("day_t").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({sh} - __r AS INT))")
        ).alias("__s_present"),
        F.count(F.lit(1)).alias("n_present_registers"),
    )
    s_total = (
        F.col("__s_present")
        + (F.lit(m) - F.col("n_present_registers")) * F.lit(1 << sh)
    )
    est_raw = F.lit(_hll_numerator(m, p)) / s_total.cast("double")
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(m) - F.col("n_present_registers")).cast("double")
    )
    return per.select(
        F.col("day_t").alias("day"),
        F.col("n_present_registers"),
        (F.lit(m) - F.col("n_present_registers")).alias("n_zero_registers"),
        est_raw.alias("est_raw"),
        F.round(
            F.when(
                (est_raw <= F.lit(2.5 * m))
                & (F.col("n_present_registers") < m),
                linear,
            ).otherwise(est_raw),
            2,
        ).alias("est_distinct"),
    )
