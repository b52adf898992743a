"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine, phash-hamming.

Design rule: every hash is derived from md5 (identical in Spark and
DuckDB), so the oracle SQL reproduces the exact same candidate pairs —
the correctness gate checks real values, not just row counts. The one
Python kernel (SimHash) is an Arrow-batched pandas UDF.

Scale notes (10^12 rows): every op here is shuffle-bounded by
(doc, shingle/band) explosion, all joins are equi-joins on
hash-distributed keys, and the LSH band join replaces the quadratic
all-pairs comparison with per-bucket candidates — the standard
web-scale near-dup shape (MinHashLSH as in Lee et al. 2022).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyrosm_spark.operators.text import tokens_col, tokens_sql

# ---- deterministic MinHash parameters (frozen; mirrored in SQL) -----------
MINHASH_P = 1_000_000_007
_rng = np.random.default_rng(20260816)
MINHASH_A = [int(a) for a in _rng.integers(1, 1 << 30, 16)]
MINHASH_B = [int(b) for b in _rng.integers(0, MINHASH_P, 16)]
N_HASHES = 16
LSH_BANDS = 4
LSH_ROWS = 4  # N_HASHES = LSH_BANDS * LSH_ROWS
SHINGLE_N = 3


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: every row mapped to the minimum id
    sharing its md5(text); ``is_duplicate`` marks non-canonical rows.
    One shuffle on the 128-bit content hash."""
    h = F.md5(F.col(text_col))
    from pyspark.sql import Window as W

    w = W.partitionBy("content_hash")
    return (
        docs.withColumn("content_hash", h)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "content_hash", "canonical_id", "is_duplicate")
    )


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
        SELECT doc_id, md5(text) AS content_hash,
               min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
               doc_id != min(doc_id) OVER (PARTITION BY md5(text))
                   AS is_duplicate
        FROM {table}
    """


# --------------------------------------------------------------------------
# Shingles (shared by jaccard + minhash)
# --------------------------------------------------------------------------

def shingles_col(text, n: int = SHINGLE_N):
    """Distinct word n-grams; docs with < n tokens contribute their full
    token join as the single shingle."""
    toks = tokens_col(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(whole)
    )


def shingles_sql(text: str, n: int = SHINGLE_N) -> str:
    toks = tokens_sql(text)
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    whole = f"[array_to_string({toks}, ' ')]"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN {grams} "
        f"ELSE {whole} END)"
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        n: int = SHINGLE_N, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via an inverted
    shingle index (explode -> self-join on shingle -> pair count).
    Shuffles on shingle then on pair — no cross join anywhere."""
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_col(F.col(text_col), n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_sql(table: str = "documents", threshold: float = 0.5,
                      n: int = SHINGLE_N) -> str:
    sh = shingles_sql("text", n)
    return f"""
        WITH sh AS (
            SELECT doc_id AS doc, unnest({sh}) AS shingle FROM {table}
        ),
        sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
        common AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(common AS DOUBLE)
                     / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= {threshold}
    """


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _shingle_int_col(shingle):
    """Deterministic 30-bit integer from a shingle: md5 prefix — the
    cross-engine hash primitive."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long") % (
        1 << 30
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """doc -> MinHash signature (N_HASHES universal-hash minima).

    h_i(s) = (a_i * x(s) + b_i) mod p over the doc's shingle set; x(s)
    is the md5-derived 30-bit int (products stay < 2^60: no overflow).
    One explode + one groupBy with N_HASHES min() aggregates.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_col(F.col(text_col))).alias("shingle"),
    ).withColumn("x", _shingle_int_col(F.col("shingle")))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("x") + F.lit(MINHASH_B[i]))
              % MINHASH_P).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_signature_sql(table: str = "documents") -> str:
    sh = shingles_sql("text")
    x = "(('0x' || substr(md5(shingle), 1, 8))::BIGINT % 1073741824)"
    mins = ",\n               ".join(
        f"min(({MINHASH_A[i]} * {x} + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}"
        for i in range(N_HASHES)
    )
    return f"""
        WITH sh AS (
            SELECT doc_id AS doc, unnest({sh}) AS shingle FROM {table}
        )
        SELECT doc, {mins} FROM sh GROUP BY doc
    """


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: signatures banded (LSH_BANDS x LSH_ROWS);
    docs sharing any band-hash become a candidate pair. The band join is
    an equi-join on (band, band_key) — per-bucket work only."""
    sig = minhash_signatures(docs, text_col, id_col)
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"h{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        bands.append(F.struct(F.lit(b).alias("band"),
                              F.md5(F.concat_ws(",", *cols)).alias("key")))
    banded = sig.select(
        "doc", F.explode(F.array(*bands)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs_sql(table: str = "documents") -> str:
    sig = minhash_signature_sql(table)
    band_rows = []
    for b in range(LSH_BANDS):
        cols = ", ".join(f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        band_rows.append(
            f"SELECT doc, {b} AS band, "
            f"md5(concat_ws(',', {cols})) AS key FROM sig"
        )
    banded = " UNION ALL ".join(band_rows)
    return f"""
        WITH sig AS ({sig}),
        banded AS ({banded})
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
    """


# --------------------------------------------------------------------------
# SimHash (pandas-UDF kernel; rows-only oracle)
# --------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over token md5 hashes: per bit, sum +-1 across
    tokens, sign -> bit. Arrow-batched; numpy bit matrix per batch."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, t in enumerate(text):
        toks = [w for w in (t or "").lower().strip().split() if w]
        if not toks:
            continue
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in toks:
            h = np.uint64(
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += np.where(bits == 1, 1, -1)
        val = 0
        for bit in (acc > 0)[::-1]:
            val = (val << 1) | int(bit)
        if val >= 1 << 63:
            val -= 1 << 64
        out[i] = val
    return pd.Series(out)


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded on 16-bit
    chunks (any pair within hamming<=3*16 shares >=1 identical chunk for
    d<=... standard pigeonhole: d <= 3 guarantees a shared 16-bit band
    of 4). Band equi-join + native bit_count(xor) refine."""
    sh = docs.select(F.col(id_col).alias("doc"),
                     simhash64(F.col(text_col)).alias("sim"))
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("sim"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)
    ])
    banded = sh.select("doc", "sim", F.explode(bands).alias("bk")).select(
        "doc", "sim", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
                F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim")))
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (exact baseline + the oracle-checked form)
# --------------------------------------------------------------------------

def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine >= threshold. Join-on-inequality (id<id)
    — the correctness baseline; the scale path buckets by hyperplane
    LSH first (see similarity.lsh_bucket_pairs). Dot/norm stay native
    (zip_with + aggregate = JVM codegen)."""
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("norm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm")), 6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_cosine_sql(table: str = "embeddings",
                         threshold: float = 0.95) -> str:
    cos = (
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[]))"
    )
    return f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({cos}, 6) AS cosine
        FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
        WHERE {cos} >= {threshold}
    """


# --------------------------------------------------------------------------
# Image phash near-dup (hamming banding, fully native)
# --------------------------------------------------------------------------

def phash_pairs(images: DataFrame, max_hamming: int = 6,
                id_col: str = "image_id",
                phash_col: str = "phash") -> DataFrame:
    """Near-duplicate images by perceptual-hash hamming distance,
    16-bit-band blocked (pigeonhole-complete for max_hamming <= 3; a
    recall/cost dial above that)."""
    base = images.select(F.col(id_col).alias("img"),
                         F.col(phash_col).alias("ph"))
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("ph"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)
    ])
    banded = base.select("img", "ph", F.explode(bands).alias("bk")).select(
        "img", "ph", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.img") < F.col("b.img")))
        .select(F.col("a.img").alias("img_a"), F.col("b.img").alias("img_b"),
                F.bit_count(F.col("a.ph").bitwiseXOR(F.col("b.ph")))
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def phash_pairs_sql(images_path: str, max_hamming: int = 6) -> str:
    bands = " UNION ALL ".join(
        f"SELECT image_id AS img, phash AS ph, {i} AS band, "
        f"(phash >> {16 * i}) & 65535 AS key "
        f"FROM read_parquet('{images_path}')"
        for i in range(4)
    )
    return f"""
        WITH banded AS ({bands})
        SELECT DISTINCT a.img AS img_a, b.img AS img_b,
               bit_count(xor(a.ph, b.ph)) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.img < b.img
        WHERE bit_count(xor(a.ph, b.ph)) <= {max_hamming}
    """
