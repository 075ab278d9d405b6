"""Multimodal (image/audio/video) column plumbing.

Media rides through Spark as opaque `binary` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas.  The actual codec libraries (PIL/ffmpeg/
librosa) are not in this environment, so the decode step is gated behind an
import-try with a deterministic fallback "decoder" — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, checksum long, head_md5 string, "
    "width int, height int, decoded boolean"
)


def _real_decode(payload: bytes):  # pragma: no cover - codec libs absent here
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, True
    except ImportError:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install pillow to enable real decode"
        )


def _fake_decode(payload: bytes) -> tuple[int, int, bool]:
    """Deterministic stand-in decoder: dimensions derived from content."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, False


def extract_media_features(df: DataFrame) -> DataFrame:
    """binary payload -> per-item features, one Arrow batch at a time.

    The batch loop is where a real pipeline would call the codec; batches
    keep the Python boundary amortized (one crossing per ~10k rows, not per
    row), and partitioning is inherited from the upstream source so media
    blobs never shuffle.
    """

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                try:
                    w, h, decoded = _real_decode(data)
                except NotImplementedError:
                    w, h, decoded = _fake_decode(data)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(data),
                        "checksum": zlib.crc32(data),
                        "head_md5": hashlib.md5(data[:64]).hexdigest(),
                        "width": w,
                        "height": h,
                        "decoded": decoded,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_bytes",
                    "checksum",
                    "head_md5",
                    "width",
                    "height",
                    "decoded",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(feats, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table from documents (text bytes as fake payloads).

    Test scaffolding: exercises the binary column path end-to-end with
    deterministic content in an environment with no real media files.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, "
    "src_n_bytes long, n_bytes long"
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: binary in -> binary out at (width, height).

    The real pipeline resamples pixels with a codec (absent here); the
    deterministic stand-in emits a payload whose bytes are a seeded
    xor-fold of the source at the target byte budget (3 bytes/px), so
    output size, schema, and content are all reproducible and testable.
    Like `extract_media_features`, one Arrow crossing per batch and no
    shuffle: resize is embarrassingly parallel over the source layout.
    """
    budget = width * height * 3

    def _fake_resize(data: bytes) -> bytes:
        if not data:
            return b"\x00" * budget
        # deterministic "resample": tile source bytes to the byte budget,
        # xor-mixed with a position byte so tiles aren't pure repeats
        reps = -(-budget // len(data))
        tiled = (data * reps)[:budget]
        return bytes(b ^ (i & 0xFF) for i, b in enumerate(tiled))

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                out = _fake_resize(data)
                rows.append(
                    {
                        "media_id": int(mid),
                        "payload": out,
                        "width": width,
                        "height": height,
                        "src_n_bytes": len(data),
                        "n_bytes": len(out),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "payload", "width", "height",
                         "src_n_bytes", "n_bytes"],
            )

    return df.select("media_id", "payload").mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.

    Decode is stubbed (no codec); the explode/planning side — which frames,
    which rows, what schema — is the Spark-native part and is real.
    """
    n_frames = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_no"),
    ).withColumn("frame_ts_ms", F.col("frame_no") * every_ms)


AUDIO_WINDOW_SCHEMA = (
    "media_id long, window_no long, n_samples long, sum_abs long, peak_abs long"
)


def audio_window_energy(df: DataFrame, window_samples: int = 64) -> DataFrame:
    """Audio feature extraction: per-window loudness over PCM samples.

    Interprets each binary payload as 16-bit little-endian PCM (the
    raw-WAV layout — for raw audio this interpretation IS the decode; a
    compressed codec (mp3/ogg) would slot into the same batch loop behind
    the import gate like `_real_decode`).  Emits one row per fixed window
    of `window_samples` samples: (media_id, window_no, n_samples,
    sum_abs, peak_abs) — all integer math, so the features are exact and
    engine-independent.  A trailing odd byte is dropped; payloads under
    one sample emit no rows.

    Scale shape: Arrow-batched numpy over mapInPandas, partitioning
    inherited from the source — payload bytes never shuffle, the output
    is the (tiny) feature table.
    """

    def _energy(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list[int]] = {
                "media_id": [], "window_no": [], "n_samples": [],
                "sum_abs": [], "peak_abs": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                usable = len(data) // 2 * 2
                if usable == 0:
                    continue
                samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.int64)
                aval = np.abs(samples)
                for w0 in range(0, len(aval), window_samples):
                    seg = aval[w0 : w0 + window_samples]
                    out["media_id"].append(int(mid))
                    out["window_no"].append(w0 // window_samples)
                    out["n_samples"].append(len(seg))
                    out["sum_abs"].append(int(seg.sum()))
                    out["peak_abs"].append(int(seg.max()))
            yield pd.DataFrame(out, dtype="int64")

    return df.select("media_id", "payload").mapInPandas(_energy, AUDIO_WINDOW_SCHEMA)


AHASH_SCHEMA = "media_id long, ahash long"
_AHASH_GRID = 60  # 60 bits: bit 63 overflows DuckDB's signed left shift


def ahash_signatures(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) signatures over binary payloads.

    The classic image near-dup fingerprint: resample to a fixed grid,
    threshold each cell against the image mean, pack the bits.  The
    stand-in "resample" tiles the payload bytes to a 60-cell grid
    (cell i = byte[i % n] — for a real image the codec's 8x8 grayscale
    thumbnail slots in here, like `_real_decode`); the threshold compare
    is `grid * cell > total` — pure integer math, no float mean — so the
    hash is exact and SQL-rederivable.  Empty payloads emit no row.

    Arrow-batched numpy over mapInPandas, partitioning inherited: the
    payload bytes never shuffle, only (id, 8-byte hash) leaves the scan.
    """
    import numpy as np

    grid = _AHASH_GRID

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            hs: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not data:
                    continue
                reps = -(-grid // len(data))
                tiled = (data * reps)[:grid]
                arr = np.frombuffer(tiled, np.uint8).astype(np.int64)
                bits = (arr * grid > arr.sum()).astype(np.int64)
                ids.append(int(mid))
                hs.append(int((bits << np.arange(grid, dtype=np.int64)).sum()))
            yield pd.DataFrame({"media_id": ids, "ahash": hs}, dtype="int64")

    return df.select("media_id", "payload").mapInPandas(fn, AHASH_SCHEMA)


def ahash_near_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bands: int = 10,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash banding.

    Recall guarantee: a pair is found iff it collides in some band, and by
    pigeonhole any pair with hamming < bands MUST collide in one — so
    recall is exact only while max_hamming < bands; beyond that, pairs can
    be silently missed.  The defaults (max_hamming=6, bands=10 of 6 bits)
    satisfy the inequality, so default recall is exact.  Callers raising
    max_hamming must raise bands with it (same argument as dd4's SimHash
    blocking).  `max_bucket` optionally drops degenerate buckets (one
    viral thumbnail repeated millions of times), the s6 spam-cluster
    guard.

    Scale shape: signatures leave the scan as (id, long); the self-join
    keys on (band, 15-bit value); hamming is one codegen xor+bit_count.
    """
    band_bits = _AHASH_GRID // bands
    mask = (1 << band_bits) - 1
    sig = ahash_signatures(df).cache()  # feeds both join sides once
    bucket_arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.shiftright(F.col("ahash"), k * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for k in range(bands)
        ]
    )
    bk = sig.select("media_id", "ahash", F.explode(bucket_arr).alias("b")).select(
        "media_id", "ahash", "b.k", "b.bv"
    )
    if max_bucket is not None:
        hot = (
            bk.groupBy("k", "bv")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("k", "bv")
        )
        bk = bk.join(F.broadcast(hot), ["k", "bv"], "left_anti")
    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


SCENE_SCHEMA = "media_id long, cut_idx long, prev_energy long, energy long"


def scene_cuts(
    df: DataFrame, frame_bytes: int = 16, threshold: int = 200
) -> DataFrame:
    """Scene-change detection over binary media payloads: the payload is a
    frame stream (`frame_bytes` per frame, trailing partial frame dropped
    — mm2's convention), per-frame energy is the integer sum of its
    bytes, and a cut is any frame whose |energy - previous energy|
    exceeds `threshold`.  The shot-boundary primitive video curation
    pipelines key on (sample around cuts, drop static spans); a real
    codec's luma histogramming slots in behind the same signature, like
    `_real_decode`.

    All-integer math, so the output is exactly SQL-rederivable over
    hex(payload) (the mm4 audio move).  Output: (media_id, cut_idx,
    prev_energy, energy) — cut_idx is the 1-based index of the frame
    AFTER the boundary.

    Arrow-batched numpy over mapInPandas, partitioning inherited: payload
    bytes never shuffle; only the (rare) cut rows leave the scan.
    """
    import numpy as np

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            prevs: list[int] = []
            curs: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n_frames = len(data) // frame_bytes
                if n_frames < 2:
                    continue
                arr = np.frombuffer(
                    data[: n_frames * frame_bytes], np.uint8
                ).reshape(n_frames, frame_bytes)
                energy = arr.sum(axis=1, dtype=np.int64)
                diff = np.abs(np.diff(energy))
                for i in np.nonzero(diff > threshold)[0]:
                    ids.append(int(mid))
                    idxs.append(int(i) + 1)
                    prevs.append(int(energy[i]))
                    curs.append(int(energy[i + 1]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "cut_idx": pd.Series(idxs, dtype="int64"),
                    "prev_energy": pd.Series(prevs, dtype="int64"),
                    "energy": pd.Series(curs, dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, SCENE_SCHEMA)


FRAME_ENERGY_SCHEMA = "media_id long, fi long, energy long"


def frame_energies(df: DataFrame, frame_bytes: int = 16) -> DataFrame:
    """Per-frame integer energies of a frame-stream payload (mm2/mm6's
    convention: `frame_bytes` per frame, trailing partial dropped).
    Arrow-batched numpy; the payload never shuffles — only (id, frame,
    energy) longs leave the scan, which for real frames (KBs each) is a
    negligible fraction of the input bytes.
    """
    import numpy as np

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            es: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n_frames = len(data) // frame_bytes
                if n_frames < 1:
                    continue
                arr = np.frombuffer(
                    data[: n_frames * frame_bytes], np.uint8
                ).reshape(n_frames, frame_bytes)
                energy = arr.sum(axis=1, dtype=np.int64)
                ids.extend([int(mid)] * n_frames)
                idxs.extend(range(n_frames))
                es.extend(int(x) for x in energy)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "fi": pd.Series(idxs, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, FRAME_ENERGY_SCHEMA)


def scene_keyframes(
    df: DataFrame, frame_bytes: int = 16, threshold: int = 200
) -> DataFrame:
    """Keyframe selection: segment each media's frame stream into scenes
    at mm6's cut boundaries (|energy - lag| > threshold), then pick ONE
    representative frame per scene — the frame whose energy is closest
    to the scene mean, compared in integers as |energy * n - sum| (no
    division, so the argmin is exact), ties to the earliest frame.  The
    video-curation primitive after shot detection: sample one frame per
    shot instead of every frame.

    Plan shape: scene assignment is a running sum over the SAME
    (media_id, fi) window the lag uses, and the per-scene stats
    (n/sum/span) are window aggregates over (media_id, scene_idx) — a
    window-only formulation on purpose: a groupBy+join would make
    Catalyst re-run the mapInPandas energy scan once per branch (the
    multi-branch recompute trap, docs/PLANS.md).  One exchange on
    media_id, one on (media_id, scene_idx); payloads never shuffle.

    All-integer math => exactly SQL-rederivable (the mm6 argument).
    Output: (media_id, scene_idx, start_idx, end_idx, n_frames,
    key_idx, key_energy).
    """
    from pyspark.sql import Window as W

    e = frame_energies(df, frame_bytes)
    w = W.partitionBy("media_id").orderBy("fi")
    cut = (
        F.abs(F.col("energy") - F.lag("energy").over(w)) > threshold
    ).cast("long")
    marked = e.select(
        "media_id",
        "fi",
        "energy",
        F.coalesce(cut, F.lit(0)).alias("__c"),
    )
    scn = marked.select(
        "media_id",
        "fi",
        "energy",
        F.sum("__c")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("scene_idx"),
    )
    pw = W.partitionBy("media_id", "scene_idx")
    stats = scn.select(
        "media_id",
        "scene_idx",
        "fi",
        "energy",
        F.count(F.lit(1)).over(pw).alias("n_frames"),
        F.sum("energy").over(pw).alias("__s"),
        F.min("fi").over(pw).alias("start_idx"),
        F.max("fi").over(pw).alias("end_idx"),
    )
    rn = F.row_number().over(
        pw.orderBy(
            F.abs(F.col("energy") * F.col("n_frames") - F.col("__s")), "fi"
        )
    )
    return (
        stats.withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(
            "media_id",
            F.col("scene_idx").cast("long").alias("scene_idx"),
            "start_idx",
            "end_idx",
            F.col("n_frames").cast("long").alias("n_frames"),
            F.col("fi").alias("key_idx"),
            F.col("energy").alias("key_energy"),
        )
    )


def speech_segments(
    df: DataFrame,
    frame_bytes: int = 16,
    threshold: int = 1506,
    min_frames: int = 2,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation (VAD) over binary
    audio payloads — the silence-trimming stage ASR/TTS data pipelines
    run before transcription (webrtcvad's shape, with a real feature
    extractor sloting in behind frame_energies like `_real_decode`).

    A frame (mm2's convention: `frame_bytes` per frame, trailing partial
    dropped) is *voiced* iff its integer byte-sum energy >= `threshold`;
    maximal runs of consecutive voiced frames become segments; runs
    shorter than `min_frames` are discarded as clicks.  All-integer =>
    exactly SQL-rederivable over hex(payload) (the mm4/mm6 argument).

    Plan shape: one Arrow-batched energy scan (payload bytes never
    shuffle), run-starts by lag + running sum over the SAME (media_id,
    fi) window, then ONE map-side-combined groupBy on (media_id,
    seg_idx) over long-only rows.  seg_idx is the 1-based voiced-run
    index per media; runs dropped by `min_frames` leave gaps (their
    index was consumed) — deterministic either way.

    Output: (media_id, seg_idx, start_idx, end_idx, n_frames,
    seg_energy).
    """
    from pyspark.sql import Window as W

    e = frame_energies(df, frame_bytes)
    w = W.partitionBy("media_id").orderBy("fi")
    marked = e.select(
        "media_id",
        "fi",
        "energy",
        (F.col("energy") >= threshold).cast("long").alias("__v"),
    )
    started = marked.select(
        "media_id",
        "fi",
        "energy",
        "__v",
        (
            (F.col("__v") == 1)
            & (F.coalesce(F.lag("__v").over(w), F.lit(0)) == 0)
        )
        .cast("long")
        .alias("__st"),
    )
    runs = started.select(
        "media_id",
        "fi",
        "energy",
        "__v",
        F.sum("__st").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("seg_idx"),
    )
    return (
        runs.filter(F.col("__v") == 1)
        .groupBy("media_id", "seg_idx")
        .agg(
            F.min("fi").alias("start_idx"),
            F.max("fi").alias("end_idx"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("energy").alias("seg_energy"),
        )
        .filter(F.col("n_frames") >= min_frames)
        .select(
            "media_id",
            F.col("seg_idx").cast("long").alias("seg_idx"),
            "start_idx",
            "end_idx",
            F.col("n_frames").cast("long").alias("n_frames"),
            F.col("seg_energy").cast("long").alias("seg_energy"),
        )
    )


_PHASH_N = 32       # resample grid (NxN)
_PHASH_LOW = 8      # low-frequency block kept (8x8 minus DC -> 63 bits)
_DCT_SCALE = 1 << 14


def phash_dct_rows() -> list[list[int]]:
    """The first 8 rows of the NxN DCT-II basis as FIXED-POINT integers:
    T[k][j] = round(cos(pi*(2j+1)*k/(2N)) * 2^14).  Rounded ONCE here in
    Python and embedded as literals in both the numpy kernel and the SQL
    twin (the srp_plane_signs constant-sharing trick), so no engine ever
    evaluates a transcendental — the whole DCT is exact int64."""
    import math

    n = _PHASH_N
    return [
        [
            int(round(math.cos(math.pi * (2 * j + 1) * k / (2 * n)) * _DCT_SCALE))
            for j in range(n)
        ]
        for k in range(_PHASH_LOW)
    ]


PHASH_SCHEMA = "media_id long, phash long"


def phash_signatures(df: DataFrame) -> DataFrame:
    """Perceptual DCT hash (pHash) signatures over binary payloads — the
    frequency-domain sibling of mm5's aHash, robust to the global
    brightness/contrast shifts that flip aHash bits.

    The stand-in "resample" tiles the payload bytes to a 32x32 grid
    (cell i = byte[i % n], the mm5 convention; a codec's grayscale
    thumbnail slots in via `_real_decode`), then D = T8 @ P @ T8^T with
    the fixed-point integer DCT rows (phash_dct_rows) — max |entry|
    32*16384*255*16384*32 fits int64 — keeps the low 8x8 block minus the
    DC term, and sets bit pos (pos = k1*8+k2-1) iff the coefficient
    exceeds the exact MEDIAN (the 32nd order statistic of the 63 ints).
    Every step is integer math, so the hash is SQL-rederivable.

    Payload bytes never shuffle; only (id, 8-byte hash) leaves the scan.
    """
    import numpy as np

    n, low = _PHASH_N, _PHASH_LOW
    T8 = np.asarray(phash_dct_rows(), dtype=np.int64)
    cells = n * n

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            hs: list[int] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if not data:
                    continue
                reps = -(-cells // len(data))
                tiled = (data * reps)[:cells]
                P = (
                    np.frombuffer(tiled, np.uint8)
                    .astype(np.int64)
                    .reshape(n, n)
                )
                D = T8 @ P @ T8.T
                vals = D.ravel()[1:]  # row-major = (k1*8 + k2), drop DC
                med = int(np.sort(vals, kind="stable")[31])
                bits = (vals > med).astype(np.int64)
                ids.append(int(mid))
                hs.append(int((bits << np.arange(low * low - 1, dtype=np.int64)).sum()))
            yield pd.DataFrame({"media_id": ids, "phash": hs}, dtype="int64")

    return df.select("media_id", "payload").mapInPandas(fn, PHASH_SCHEMA)


def phash_near_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    bands: int = 9,
    max_bucket: int | None = None,
) -> DataFrame:
    """pHash near-duplicate pairs — mm5's banding machinery over the
    63-bit DCT hash: 9 bands of 7 bits, pigeonhole-exact recall for
    hamming <= 8 (max_hamming < bands, the mm5/dd4 inequality);
    `max_bucket` is the viral-thumbnail guard."""
    band_bits = 63 // bands
    mask = (1 << band_bits) - 1
    sig = phash_signatures(df).cache()  # feeds both join sides once
    bucket_arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.shiftright(F.col("phash"), k * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for k in range(bands)
        ]
    )
    bk = sig.select("media_id", "phash", F.explode(bucket_arr).alias("b")).select(
        "media_id", "phash", "b.k", "b.bv"
    )
    if max_bucket is not None:
        hot = (
            bk.groupBy("k", "bv")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("k", "bv")
        )
        bk = bk.join(F.broadcast(hot), ["k", "bv"], "left_anti")
    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
