"""Semantic tests for the LLM-data operators whose queries() entries are
rows-only (engine-specific hashing, approximate search): pin their behavior
against exact counterparts and hand-built fixtures.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_MED


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """documents + planted exact and near duplicates."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet").limit(100)
    base = docs.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = base.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 6)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dedup_finds_planted_copies(docs_with_dups):
    from era_parser_spark.operators.dedup import dedup_exact

    out = dedup_exact(docs_with_dups, "text", "doc_id")
    survivors = {r.doc_id: r.n_copies for r in out.collect()}
    assert len(survivors) == 103  # 106 rows - 3 exact copies
    for d in (0, 1, 2):
        assert survivors[d] == 2  # original kept (min id), copy folded in
    assert 10000 not in survivors and 10001 not in survivors


def test_minhash_lsh_catches_exact_and_near_dups(docs_with_dups):
    from era_parser_spark.operators.dedup import minhash_lsh_dedup_pairs

    pairs = minhash_lsh_dedup_pairs(
        docs_with_dups, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    # exact copies have jaccard 1.0 and identical signatures -> always caught
    for d in (0, 1, 2):
        assert got.get((d, d + 10000)) == pytest.approx(1.0)
    # near dups (one appended token) share almost all shingles
    for d in (3, 4, 5):
        assert (d, d + 20000) in got
        assert got[(d, d + 20000)] > 0.8


def test_lsh_candidates_subset_of_exact_pairs(spark):
    """Every verified LSH pair must carry the exact jaccard value that the
    exact pairwise op computes (LSH only prunes, never invents)."""
    from era_parser_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet").limit(120)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    lsh = minhash_lsh_dedup_pairs(docs, "doc_id", "text").collect()
    for r in lsh:
        assert exact[(r.doc_a, r.doc_b)] == pytest.approx(r.jaccard)


def test_hot_shingle_guard_bounds_viral_blowup(spark):
    """One shingle shared by every doc makes the unguarded self-join emit a
    full quadratic pair set; the frequency guard confines pairs to docs
    that share a *rare* shingle, and reports the viral shingle."""
    from era_parser_spark.operators.dedup import (
        doc_shingles,
        hot_shingles,
        ngram_jaccard_pairs,
    )

    n = 60
    rows = [
        # every doc carries the same viral boilerplate; only consecutive
        # doc pairs also share a rare 3-gram ("uniq{i} uniq{i} uniq{i+1}"
        # chains don't exist — we plant an explicit shared tail instead)
        (i, f"click here to subscribe now pair{i // 2} pair{i // 2} pair{i // 2}")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unguarded = ngram_jaccard_pairs(docs, "doc_id", "text", n=3)
    assert unguarded.count() == n * (n - 1) // 2  # full quadratic blowup

    guarded = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, max_doc_freq=10)
    got = {(r.doc_a, r.doc_b) for r in guarded.collect()}
    # only the planted even/odd twins survive the guard
    assert got == {(2 * k, 2 * k + 1) for k in range(n // 2)}
    # sizes still count dropped shingles: jaccard is the true value here
    # because the surviving pairs' rare shingles were never dropped but
    # their viral intersection was -> inter undercounts by the guard's
    # design (lower bound)
    for r in guarded.collect():
        assert r.inter >= 1 and r.jaccard > 0

    # the diagnostic surfaces exactly the viral boilerplate shingles
    ex = doc_shingles(docs, "doc_id", "text", 3)
    hot = {r.shingle: r.doc_freq for r in hot_shingles(ex, 10).collect()}
    assert all(v == n for v in hot.values())
    assert "click here to" in hot


def test_hot_shingle_guard_recall_curve(spark):
    """Quantifies the guard's recall cost on a corpus with KNOWN near-dup
    pairs whose similarity depends on boilerplate of known virality.

    Three planted pair classes (all true Jaccard >= 0.5 unguarded):
      R (40 pairs): similarity from a rare pair-unique tail alone
                    (J = 28/48 ~ 0.583) — survives any guard.
      B (30 pairs): needs boilerplate shared by 300 docs to cross 0.5
                    (J = 23/43 ~ 0.535 with it, 10/43 ~ 0.233 without).
      C (30 pairs): same shape, boilerplate shared by 80 docs.
    Pair-recall@0.5 by max_doc_freq is therefore exactly:
      500 -> 1.0 (nothing viral enough), 100 -> 0.7 (drops B's
      boilerplate, df=300), 50 -> 0.4 (drops B and C, df=80).
    The guard-stats metadata must report exactly the dropped boilerplate:
    each block is 15 tokens = 13 shingles.  Curve recorded in
    docs/PLANS.md; doc-unique junction tokens keep every other shingle
    disjoint so the numbers are exact, not approximate."""
    from era_parser_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_with_guard_stats,
    )

    def paired_doc(i, pair, boil, tail_len, fill_len):
        fill = " ".join(f"u{i}x{k}" for k in range(fill_len))
        tail = " ".join(f"p{pair}t{k}" for k in range(tail_len))
        segs = [fill] + ([boil] if boil else []) + [tail]
        return f" w{i}a w{i}b ".join(segs)

    def plain_doc(i, boil):
        fill = " ".join(f"u{i}x{k}" for k in range(10))
        return f"{fill} w{i}a w{i}b {boil}"

    boil_b = " ".join(f"bb{k}" for k in range(15))  # ends up in 300 docs
    boil_c = " ".join(f"cc{k}" for k in range(15))  # ends up in 80 docs
    rows = []
    for k in range(40):  # class R: docs 0..79
        for j in (0, 1):
            i = 2 * k + j
            rows.append((i, paired_doc(i, f"R{k}", None, 30, 8)))
    for k in range(30):  # class B pairs: docs 100..159
        for j in (0, 1):
            i = 100 + 2 * k + j
            rows.append((i, paired_doc(i, f"B{k}", boil_b, 12, 4)))
    rows += [(i, plain_doc(i, boil_b)) for i in range(160, 400)]  # df_B=300
    for k in range(30):  # class C pairs: docs 500..559
        for j in (0, 1):
            i = 500 + 2 * k + j
            rows.append((i, paired_doc(i, f"C{k}", boil_c, 12, 4)))
    rows += [(i, plain_doc(i, boil_c)) for i in range(560, 580)]  # df_C=80
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3).collect()
        if r.jaccard >= 0.5
    }
    planted = (
        {(2 * k, 2 * k + 1) for k in range(40)}
        | {(100 + 2 * k, 100 + 2 * k + 1) for k in range(30)}
        | {(500 + 2 * k, 500 + 2 * k + 1) for k in range(30)}
    )
    assert truth == planted and len(truth) == 100

    expected = {
        50: (0.40, 26, 13 * 300 + 13 * 80),
        100: (0.70, 13, 13 * 300),
        500: (1.00, 0, 0),
    }
    for mdf, (want_recall, want_hot, want_dropped) in expected.items():
        pairs, stats = ngram_jaccard_with_guard_stats(
            docs, "doc_id", "text", n=3, max_doc_freq=mdf
        )
        got = {
            (r.doc_a, r.doc_b) for r in pairs.collect() if r.jaccard >= 0.5
        }
        assert got <= truth  # the guard never invents pairs
        recall = len(got & truth) / len(truth)
        assert recall == pytest.approx(want_recall), (mdf, recall)
        assert stats["n_hot_shingles"] == want_hot
        assert stats["dropped_index_rows"] == want_dropped

    # unguarded stats are all-zero and the pairs df is the plain operator
    _, stats0 = ngram_jaccard_with_guard_stats(docs, "doc_id", "text", n=3)
    assert stats0 == {
        "n_hot_shingles": 0, "dropped_index_rows": 0, "max_hot_doc_freq": 0
    }


def test_lsh_recall_is_exact_at_fixture_threshold(spark):
    """Pins the property dd3's exact DuckDB oracle rests on: at threshold
    0.5 on the sf0.01 fixture, LSH (32 perms, 8x4 bands) recalls EVERY true
    near-dup pair, so pipeline output == {exact Jaccard pairs >= 0.5}.
    If fixture or parameters change and recall drops below 1.0, this test
    fails before the driver's oracle compare does."""
    from era_parser_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text")
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
        ).collect()
    }
    assert truth, "fixture lost its planted near-dups"
    assert lsh == truth


def test_simhash_identical_and_perturbed(spark):
    from era_parser_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "the quick brown fox jumps over the lazy dog " * 5),
            (3, "the quick brown fox jumps over the lazy dog " * 5 + " tail"),
            (4, "completely different content about spark engines and parquet"),
        ],
        ["doc_id", "text"],
    )
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]  # identical text -> identical fingerprint

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(fp[1], fp[3]) < ham(fp[1], fp[4])


def test_simhash_near_pairs_blocks(spark):
    from era_parser_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta " * 10),
            (2, "alpha beta gamma delta epsilon zeta eta theta " * 10),
            (3, "totally unrelated words nothing shared here at all " * 10),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(df, "doc_id", "text").collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs


def test_simhash_blocking_exact_below_hamming_4(spark):
    """Pigeonhole exactness region: with 4 bands of 16 bits over a 64-bit
    fingerprint, a pair differing in <= 3 bits can touch at most 3 bands,
    so at least one band collides and the pair is ALWAYS blocked together.
    Assert recall 1.0 vs brute force in that region on real fixture docs
    plus planted low-distance perturbations."""
    from era_parser_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    base = spark.read.parquet(f"{SF_MED}/documents.parquet").limit(200).select("doc_id", "text")
    # plant guaranteed-low-hamming pairs: exact copies (hamming 0) and
    # single-token tweaks (usually a handful of bits)
    copies = base.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    tweaked = base.filter((F.col("doc_id") >= 8) & (F.col("doc_id") < 16)).select(
        (F.col("doc_id") + 60000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    docs = base.unionByName(copies).unionByName(tweaked).cache()

    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs, "doc_id", "text").collect()}
    ids = sorted(fp)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fp[a] ^ fp[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert truth, "no low-hamming pairs planted — fixture drifted"

    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == truth  # exact, both directions, in the pigeonhole region


def test_ivf_recall_vs_brute_force(spark):
    """recall@10 vs the s1 brute-force baseline for BOTH centroid seeding
    modes (deterministic stride = the oracle path; Spark ML KMeans =
    production quality).  The sf0.01 fixture is 500 near-uniform random
    vectors over 64 cells (~8 vectors/cell), so per-query recall is noisy
    and neither mode dominates — the pinned bound is the mean over three
    queries; measured curve: stride 5-8/10, kmeans 4-8/10 at nprobe=5."""
    from era_parser_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    recalls: dict[str, list[int]] = {"stride": [], "kmeans": []}
    for qid in (7, 0, 123):
        q = [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]]
        brute = [
            r.vec_id for r in cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
        ]
        assert brute[0] == qid  # self is most similar
        for trainer in ("stride", "kmeans"):
            approx = [
                r.vec_id
                for r in ivf_topk(
                    emb, "embedding", "vec_id", q, k=10,
                    stride=25, nprobe=5, trainer=trainer,
                ).collect()
            ]
            recalls[trainer].append(len(set(brute) & set(approx)))
    for trainer, per_q in recalls.items():
        mean = sum(per_q) / (10 * len(per_q))
        print(f"ivf recall@10 [{trainer}]: {per_q} mean={mean:.2f}")
        assert mean >= 0.5, f"{trainer} recall too low: {per_q}"
        assert min(per_q) >= 3, f"{trainer} has a collapsed query: {per_q}"


def test_kmeans_centroids_deterministic_and_usable(spark):
    """trainer='kmeans' is seed-deterministic, emits the same (centroid_id,
    cvec) schema as the stride path, and its assignment covers the corpus."""
    from era_parser_spark.operators.similarity import centroid_table, ivf_assign

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    c1 = centroid_table(emb, "embedding", "vec_id", k=16, trainer="kmeans")
    c2 = centroid_table(emb, "embedding", "vec_id", k=16, trainer="kmeans")
    assert c1.columns == ["centroid_id", "cvec"]
    rows1 = sorted((r.centroid_id, tuple(r.cvec)) for r in c1.collect())
    rows2 = sorted((r.centroid_id, tuple(r.cvec)) for r in c2.collect())
    assert rows1 == rows2  # same seed -> same centers
    assert len(rows1) == 16
    assigned = ivf_assign(emb, "embedding", "vec_id", c1)
    assert assigned.count() == emb.count()
    n_cells = assigned.select("centroid_id").distinct().count()
    assert n_cells > 1  # the assignment actually spreads over cells
    import pytest as _pytest

    with _pytest.raises(ValueError):
        centroid_table(emb, "embedding", "vec_id", trainer="bogus")


def test_multimodal_features_deterministic(spark):
    from era_parser_spark.operators.multimodal import (
        documents_as_media,
        extract_media_features,
        frame_sample,
    )

    docs = spark.read.parquet(f"{SF_MED}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r for r in feats}
    raw = {r.doc_id: r.text for r in docs.collect()}
    for mid, r in by_id.items():
        assert r.n_bytes == len(raw[mid].encode())
        assert not r.decoded  # codec absent -> deterministic fake decode
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480

    vids = media.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3500).cast("long").alias("duration_ms"),
        ),
    )
    frames = frame_sample(vids, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per)  # 3500ms / 1000ms -> frames 0,1,2


def test_approx_stats_error_bounds(spark):
    """x8: sketches must stay within advertised error of the exact values."""
    from era_parser_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["x8_approx_stats"](spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users - r.exact_users) / max(r.exact_users, 1) < 0.05
        assert abs(r.approx_p50 - r.exact_p50) / max(abs(r.exact_p50), 1e-9) < 0.05


def test_resize_media_deterministic_and_budgeted(spark):
    from era_parser_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, b"abc"), (2, b""), (3, bytes(range(200)))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_media(media, width=2, height=1).collect()}
    # byte budget is width*height*3 for every row, regardless of input size
    assert all(r.n_bytes == 6 and len(r.payload) == 6 for r in out.values())
    assert out[1].src_n_bytes == 3 and out[2].src_n_bytes == 0
    # independent expectation of the fake resampler: tile then xor position
    tiled = (b"abc" * 2)[:6]
    assert bytes(out[1].payload) == bytes(b ^ (i & 0xFF) for i, b in enumerate(tiled))
    assert bytes(out[2].payload) == b"\x00" * 6
    # deterministic: a second run yields identical bytes
    again = {r.media_id: bytes(r.payload)
             for r in resize_media(media, width=2, height=1).collect()}
    assert again == {k: bytes(v.payload) for k, v in out.items()}


def test_mm_query_entries(spark):
    from era_parser_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    frames = QUERIES["mm2_frame_sample"](spark, SF_MED)
    rows = frames.collect()
    assert rows and "mm2_frame_sample" in ORACLES
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append((r.frame_no, r.frame_ts_ms))
    for frames_list in by_media.values():
        nos = sorted(n for n, _ in frames_list)
        assert nos == list(range(len(nos)))  # contiguous from 0
        assert all(ts == n * 1000 for n, ts in frames_list)

    resized = QUERIES["mm3_resize"](spark, SF_MED).limit(5).collect()
    assert all(r.n_bytes == 32 * 16 * 3 for r in resized)
    assert all(len(r.payload_md5) == 32 for r in resized)


def test_decontamination_finds_planted_quote(spark):
    """A benchmark doc quoted verbatim inside a longer training doc must
    surface with containment 1.0 (every benchmark shingle present) even
    though Jaccard vs the long doc is low — the metric dd7 exists for."""
    from era_parser_spark.operators.dedup import cross_corpus_overlap

    bench = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    filler = " ".join(f"w{i}" for i in range(200))
    train = spark.createDataFrame(
        [
            (1, f"{filler} alpha beta gamma delta epsilon zeta eta theta iota kappa {filler}"),
            (2, "totally unrelated content with no overlap at all " * 5),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.train_id, r.bench_id): (r.inter, r.bench_sz, r.containment)
        for r in cross_corpus_overlap(train, bench, "doc_id", "text", n=3).collect()
    }
    inter, bench_sz, containment = got[(1, 900)]
    assert containment == 1.0 and inter == bench_sz
    assert (2, 900) not in got


# --- round 5: semantic dedup (dd8), knn join (s5), repetition ratio (t7) ---


@pytest.fixture(scope="module")
def emb_with_dups(spark):
    """embeddings + planted exact-duplicate vectors (cosine exactly 1.0)."""
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    return emb.unionByName(dup).cache()


def test_semantic_dedup_collapses_planted_copies(spark, emb_with_dups):
    from era_parser_spark.operators.similarity import centroid_table, semantic_dedup

    cents = centroid_table(emb_with_dups, "embedding", "vec_id", stride=25, k=16)
    out = semantic_dedup(emb_with_dups, "embedding", "vec_id", cents, threshold=0.9)
    ids = {r.vec_id for r in out.collect()}
    # an identical vector lands in the same argmin cell, scores cosine 1.0
    # against its original, and the larger id loses (keep-min-id)
    for d in (0, 1, 2):
        assert d in ids and (d + 10000) not in ids
    # the corpus itself has no pairs >= 0.9 (max pairwise ~0.51), so the
    # planted copies are the only drops
    assert len(ids) == 500


def test_semantic_dedup_survivor_has_no_dominating_neighbor(spark):
    """Exhaustive invariant at sf0.01 vs a brute-force pandas recompute:
    dropped <=> exists smaller-id same-cluster neighbor above threshold."""
    import numpy as np

    from era_parser_spark.operators.similarity import (
        centroid_table,
        ivf_assign,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    cents = centroid_table(emb, "embedding", "vec_id", stride=25, k=16)
    survivors = {
        r.vec_id
        for r in semantic_dedup(emb, "embedding", "vec_id", cents, 0.35).collect()
    }
    rows = ivf_assign(emb, "embedding", "vec_id", cents).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    cell = {r.vec_id: r.centroid_id for r in rows}
    for vid, v in vecs.items():
        dominated = any(
            cell[o] == cell[vid]
            and o < vid
            and float(v @ vecs[o])
            / float(np.linalg.norm(v) * np.linalg.norm(vecs[o]))
            >= 0.3505  # clear of the quantization boundary
            for o in vecs
        )
        near_thr = any(
            cell[o] == cell[vid] and o < vid
            and 0.3495
            <= float(v @ vecs[o])
            / float(np.linalg.norm(v) * np.linalg.norm(vecs[o]))
            < 0.3505
            for o in vecs
        )
        if near_thr:
            continue  # within a quantization ulp of the threshold: either way
        assert (vid not in survivors) == dominated, vid


def test_knn_join_matches_per_query_bruteforce(spark):
    """Two-phase top-k over a multi-partition corpus must equal the s1
    brute-force baseline per query, ranks 1..k with id tie-breaks."""
    from era_parser_spark.operators.similarity import cosine_topk, knn_join

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").repartition(7).cache()
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    got = knn_join(emb, queries, "embedding", "vec_id", k=5).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    qvecs = {r.vec_id: [float(x) for x in r.embedding] for r in queries.collect()}
    assert set(by_q) == set(qvecs)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
        expect = cosine_topk(
            emb.filter(F.col("vec_id") != qid), "embedding", "vec_id", qvecs[qid], k=5
        ).collect()
        assert [(r.nbr_id, r.cosine_sim) for r in rows] == [
            (e.vec_id, e.cosine_sim) for e in expect
        ], qid
    emb.unpersist()


def test_repetition_metrics_hand_fixture(spark):
    from era_parser_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x"), (3, ""), (4, "w w w w")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_metrics(df, "doc_id", "text").collect()}
    assert (out[1].n_ngrams, out[1].n_distinct_ngrams) == (4, 3)
    assert out[1].dup_ngram_ratio == pytest.approx(0.25)
    assert out[2].n_ngrams == 0 and out[2].dup_ngram_ratio == 0.0
    assert out[3].n_ngrams == 0 and out[3].dup_ngram_ratio == 0.0
    assert (out[4].n_ngrams, out[4].n_distinct_ngrams) == (3, 1)
    assert out[4].dup_ngram_ratio == pytest.approx(2 / 3)


def test_repetition_metrics_trigram(spark):
    from era_parser_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [(1, "a b c a b c a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in repetition_metrics(df, "doc_id", "text", n=3).collect()}
    # trigrams: abc bca cab abc bca cab -> 6 grams, 3 distinct
    assert (out[1].n_ngrams, out[1].n_distinct_ngrams) == (6, 3)
    assert out[1].dup_ngram_ratio == pytest.approx(0.5)
    assert out[2].n_ngrams == 0  # shorter than n


def test_simhash_md5_hamming_tracks_similarity(spark):
    """dd4b: identical docs collide exactly; a one-token edit moves few
    bits; unrelated text moves many (fixed strings -> deterministic)."""
    from era_parser_spark.operators.dedup import simhash_md5_fingerprints

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    near = base.replace("lazy", "sleepy", 1)
    far = "completely unrelated words about spark parquet shuffles and arrow batches " * 6
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )
    fps = {r.doc_id: r.simhash for r in simhash_md5_fingerprints(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert fps[1] == fps[2]
    assert ham(fps[1], fps[3]) < ham(fps[1], fps[4])
    assert ham(fps[1], fps[3]) <= 15  # one token of ~60 -> few flipped bits


def test_semantic_dedup_stats_bound_the_pair_join(spark):
    """The reported candidate_pairs must equal sum(n_c choose 2) — the
    exact quadratic budget the per-cluster equi-join pays."""
    from era_parser_spark.operators.similarity import (
        centroid_table,
        ivf_assign,
        semantic_dedup_with_stats,
    )

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    cents = centroid_table(emb, "embedding", "vec_id", stride=25, k=16)
    out, stats = semantic_dedup_with_stats(emb, "embedding", "vec_id", cents, 0.35)
    sizes = [
        r.n
        for r in ivf_assign(emb, "embedding", "vec_id", cents)
        .groupBy("centroid_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    ]
    assert stats["n_clusters"] == len(sizes) == 16
    assert stats["max_cluster"] == max(sizes)
    assert stats["candidate_pairs"] == sum(n * (n - 1) // 2 for n in sizes)
    assert out.count() == 438  # same survivors as the plain operator


@pytest.fixture(scope="module")
def pathological_cell(spark):
    """A degenerate corpus where EVERY vector argmins to one cell: one
    centroid, 60 bit-identical spam vectors, 40 distinct random vectors
    (seeded, mutually dissimilar), 2 zero vectors.  Uncapped, the dd8 pair
    join would score 102*101/2 cosines in a single task group — the exact
    skew mode the max_cell guard exists for."""
    import random

    rng = random.Random(7)
    spam = [(1000 + i, [0.5, 0.5, 0.1, 0.0, 0.0, 0.0, 0.0, 0.2]) for i in range(60)]
    distinct = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    zeros = [(2000, [0.0] * 8), (2001, [0.0] * 8)]
    df = spark.createDataFrame(
        spam + distinct + zeros, "vec_id long, embedding array<double>"
    ).cache()
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "centroid_id int, cvec array<double>",
    )
    return df, cents


def test_semantic_dedup_max_cell_matches_uncapped_on_spam_cell(
    spark, pathological_cell
):
    """The guard's two steps are exact where it matters: bit-identical
    spam collapses to its min id (cosine exactly 1), distinct dissimilar
    vectors and zero vectors all survive — so on this fixture the capped
    result must EQUAL the uncapped result, while the pair join is bounded
    per sub-cell instead of 102^2 in one task."""
    from era_parser_spark.operators.similarity import semantic_dedup

    df, cents = pathological_cell
    uncapped = {
        r.vec_id
        for r in semantic_dedup(df, "embedding", "vec_id", cents, 0.99).collect()
    }
    capped = {
        r.vec_id
        for r in semantic_dedup(
            df, "embedding", "vec_id", cents, 0.99, max_cell=16
        ).collect()
    }
    assert capped == uncapped
    # spam keeps exactly its min id; distinct + zero vectors all survive
    assert 1000 in capped and not any(1001 <= v <= 1059 for v in capped)
    assert all(i in capped for i in range(40))
    assert 2000 in capped and 2001 in capped
    assert len(capped) == 43


def test_semantic_dedup_max_cell_bounds_subcell_size(spark, pathological_cell):
    """After the exact-duplicate collapse, the 43 distinct representatives
    hash-split into ceil(102/16)=7 sub-cells — re-derive the split with the
    operator's own expression (pmod(xxhash64(vec), n_sub)) and pin that no
    sub-cell approaches the uncapped 102-row cell."""
    from era_parser_spark.operators.similarity import semantic_dedup

    df, cents = pathological_cell
    reps = df.filter(~F.col("vec_id").between(1001, 1059))
    sizes = [
        r["n"]
        for r in reps.groupBy(
            F.pmod(F.xxhash64(F.col("embedding").cast("array<double>")), F.lit(7))
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert sum(sizes) == 43
    assert len(sizes) >= 4  # the hash genuinely spreads the reps
    assert max(sizes) <= 16  # deterministic under the seeded fixture

    with pytest.raises(ValueError, match="max_cell"):
        semantic_dedup(df, "embedding", "vec_id", cents, 0.99, max_cell=0)


def test_semantic_dedup_stats_surface_capped_cells(spark, pathological_cell):
    from era_parser_spark.operators.similarity import semantic_dedup_with_stats

    df, cents = pathological_cell
    out, stats = semantic_dedup_with_stats(
        df, "embedding", "vec_id", cents, 0.99, max_cell=16
    )
    assert stats["n_clusters"] == 1 and stats["max_cluster"] == 102
    assert stats["capped_cells"] == 1 and stats["capped_rows"] == 102
    assert stats["candidate_pairs"] == 102 * 101 // 2  # the uncapped budget
    assert out.count() == 43
    # without the guard nothing reports capped
    _, stats0 = semantic_dedup_with_stats(df, "embedding", "vec_id", cents, 0.99)
    assert stats0["capped_cells"] == 0 and stats0["capped_rows"] == 0


def test_semantic_dedup_large_max_cell_is_exact_path(spark):
    """A max_cell larger than every cluster must not change the result vs
    the default exact path on the real sf0.01 embeddings."""
    from era_parser_spark.operators.similarity import centroid_table, semantic_dedup

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    cents = centroid_table(emb, "embedding", "vec_id", stride=25, k=16)
    base = {
        r.vec_id
        for r in semantic_dedup(emb, "embedding", "vec_id", cents, 0.35).collect()
    }
    guarded = {
        r.vec_id
        for r in semantic_dedup(
            emb, "embedding", "vec_id", cents, 0.35, max_cell=1_000_000
        ).collect()
    }
    assert guarded == base


def test_rarity_score_orders_gibberish_above_common_prose(spark):
    """t8: a doc of corpus-unique tokens must out-score a doc made of
    tokens every document shares."""
    from era_parser_spark.operators.text import rarity_score

    rows = [(i, "common words shared by every document here") for i in range(20)]
    rows.append((100, "zxqv wkjh qpzm vvtt common"))  # 4 unique + 1 common
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in rarity_score(df, "doc_id", "text").collect()}
    assert out[100].mean_rarity > out[0].mean_rarity * 5
    # 'common' is in all 21 docs (1e6 div 21); the other 6 tokens in 20
    assert out[0].q_rarity_sum == 6 * (1_000_000 // 20) + 1_000_000 // 21
