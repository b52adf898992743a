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

from pyrosm_spark.functions.vectors import dot as _dot
from pyrosm_spark.operators.text import tokens_col, tokens_sql


def _pin_fresh(tag: str, df: DataFrame) -> DataFrame:
    """Materialize a multiply-consumed subtree under the shared
    spatial-join pin lifecycle: release the PREVIOUS call's pin for
    this tag, persist this one. Replaces raw ``localCheckpoint()``,
    which (a) accumulates storage for the life of the session — every
    dedup call in a long-lived pipeline pins another corpus x bands
    materialization until driver GC happens to collect the frame —
    and (b) is non-reliable at scale: a lost executor drops checkpoint
    partitions and FAILS the job, where a persisted frame just
    recomputes its (deterministic) lineage."""
    from pyrosm_spark.operators.spatial_join import _pin, _release_pins

    _release_pins(tag)
    return _pin(tag, df)

# ---- deterministic MinHash parameters (frozen; mirrored in SQL) -----------
MINHASH_P = 1_000_000_007
_rng = np.random.default_rng(20260816)
MINHASH_A = [int(a) for a in _rng.integers(1, 1 << 30, 16)]
MINHASH_B = [int(b) for b in _rng.integers(0, MINHASH_P, 16)]
N_HASHES = 16
LSH_BANDS = 4
LSH_ROWS = 4  # N_HASHES = LSH_BANDS * LSH_ROWS
SHINGLE_N = 3


def _ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Small files arrive as 1-2 input splits; CPU-heavy per-row work
    (shingling, hashing) then runs in one task no matter how many cores
    exist. One cheap row-level shuffle on the id unlocks the cluster.
    No-op when the scan is already wide."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, key)


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

    # NULL text (failed fetch/decode poison rows) must NOT collapse
    # into one giant duplicate cluster: md5(NULL) is NULL and
    # partitionBy groups NULLs together, so 1000 unrelated broken rows
    # would elect one canonical and drop the rest. Each NULL-text row
    # is its own singleton cluster — keyed by a non-hex-prefixed id so
    # it can never collide with a real 32-hex digest (this also removes
    # the one-hot-partition skew a big NULL group would create).
    key = F.coalesce(h, F.concat(F.lit("null:"),
                                 F.col(id_col).cast("string")))
    w = W.partitionBy("_k")
    return (
        docs.withColumn("content_hash", h)
        .withColumn("_k", key)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
        .select(id_col, "content_hash", "canonical_id", "is_duplicate")
    )


def exact_dedup_sql(table: str = "documents") -> str:
    # coalesce mirror of the engine's NULL-text singleton rule
    k = "coalesce(md5(text), 'null:' || CAST(doc_id AS VARCHAR))"
    return f"""
        SELECT doc_id, md5(text) AS content_hash,
               min(doc_id) OVER (PARTITION BY {k}) AS canonical_id,
               doc_id != min(doc_id) OVER (PARTITION BY {k})
                   AS is_duplicate
        FROM {table}
    """


# --------------------------------------------------------------------------
# Shingles (shared by jaccard + minhash)
# --------------------------------------------------------------------------

def _shingle_rows(docs: DataFrame, text_col: str, id_col: str,
                  n: int = SHINGLE_N, distinct: bool = True) -> DataFrame:
    """(doc, shingle) exploded rows, performance-shaped:

    1. tokenize in its own projection, THEN exchange — so the gram
       expressions reference a materialized token array instead of
       re-running split+regex per gram, and single-split input files
       gain parallelism;
    2. grams via native arrays_zip over shifted slices — zero lambda
       higher-order functions, so the whole pipeline stays in
       whole-stage codegen (the F.transform formulation measured ~3x
       slower: interpreted eval per gram);
    3. ``distinct`` dedupes the per-doc shingle SET (needed by jaccard;
       minhash minima are duplicate-insensitive and may skip it).
    """
    nshuf = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                           "32"))
    # The tokenize projection runs BELOW the doc exchange, i.e. in the
    # input-scan stage. A small corpus file is one row group = one
    # split, so the regex tokenizer would run in ONE task no matter the
    # core count (measured: the serial term capping 2->8-core scaling
    # at 1.15x). Spreading the raw text first costs one cheap shuffle
    # of the smallest representation and is a no-op on wide inputs.
    raw = _ensure_parallelism(
        docs.select(F.col(id_col).alias("doc"), F.col(text_col)), "doc")
    toks = raw.select("doc", tokens_col(F.col(text_col)).alias("_toks"))
    # exchange ABOVE tokenize: the stage boundary stops CollapseProject
    # from inlining split+regex into every gram slice (measured ~3x),
    # and doc-partitioning lets minhash's groupBy(doc) skip its shuffle
    toks = toks.repartition(nshuf, "doc")
    t = F.col("_toks")
    g = F.size(t) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(t, i + 1, g).alias(f"w{i}") for i in range(n)])
    grams = (
        toks.filter(F.size(t) >= n)
        .select("doc", F.explode(zipped).alias("_g"))
        .select("doc", F.concat_ws(
            " ", *[F.col(f"_g.w{i}") for i in range(n)]).alias("shingle"))
    )
    small = toks.filter((F.size(t) < n) & (F.size(t) > 0)).select(
        "doc", F.array_join(t, " ").alias("shingle"))
    sh = grams.unionAll(small)
    return sh.dropDuplicates(["doc", "shingle"]) if distinct else sh


def shingles_sql(text: str, n: int = SHINGLE_N) -> str:
    """DuckDB mirror of ``_shingle_rows``'s per-doc shingle set. The
    token-less branch yields an EMPTY list (unnest emits no rows), not
    a '' shingle — ``_shingle_rows`` filters size==0 docs out, and a ''
    shingle would spuriously pair every empty doc at jaccard 1.0."""
    toks = tokens_sql(text)
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    whole = f"[array_to_string({toks}, ' ')]"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN {grams} "
        f"WHEN len({toks}) > 0 THEN {whole} "
        f"ELSE [] END)"
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup
# --------------------------------------------------------------------------

MAX_SHINGLE_DF = 1000  # default candidate-generation df cap


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        n: int = SHINGLE_N, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_df: int | None = MAX_SHINGLE_DF) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via an inverted
    shingle index with a document-frequency cap on CANDIDATE GENERATION
    (the de-skew fix): a stop-phrase shingle shared by d documents
    would emit O(d^2) join rows on a single key, so shingles with
    df > ``max_df`` are excluded from the inverted-index self-join
    (standard near-dup practice — recall changes only for pairs whose
    EVERY shared shingle is near-universal). The Jaccard value itself
    stays EXACT: common counts are recomputed over the full shingle
    sets of each surviving candidate pair, so emitted values are
    identical to the uncapped form. ``max_df=None`` disables the cap.
    """
    # the tokenize+zip+explode+dropDuplicates subtree feeds SIX plan
    # arms (size agg, hot-df agg, both self-join sides, the two
    # full-set recount joins) — materialize it once per action, the
    # same hazard banded_self_pairs pins against. Pinned PARTITIONED BY
    # SHINGLE and materialized eagerly (see banded_self_pairs for why
    # eager): the df aggregation, the broadcast-anti-joined cold frame,
    # and BOTH inverted-index self-join sides then read the cached
    # layout exchange-free — one layout shuffle replaces three
    # shingle-table exchanges (verified in the executed plan; the
    # survivors are the candidate distinct and the doc-keyed aggs,
    # which need different keys). Per-key skew under the shingle
    # layout is bounded by the same df cap that bounds the join
    # fan-out. Wall-NEUTRAL at sandbox scales (sf0.01/sf0.1 A/B within
    # the host's noise band): the recount arms shuffle the same table
    # by other keys either way — the win is the 3->1 full-table
    # exchange count before candidate generation, which is what
    # matters when the shingle table is corpus-sized.
    nshuf = int(docs.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    sh = _pin_fresh("ngram_shingles",
                    _shingle_rows(docs, text_col, id_col, n)
                    .repartition(nshuf, "shingle"))
    sh.count()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    if max_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_df).select("shingle"))
        cold = sh.join(F.broadcast(hot), "shingle", "left_anti")
    else:
        cold = sh
    a = cold.alias("a")
    b = cold.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # exact intersection size over the FULL shingle sets of candidates
    fa = sh.select(F.col("doc").alias("doc_a"), "shingle")
    fb = sh.select(F.col("doc").alias("doc_b"), "shingle")
    common = (
        cand.join(fa, "doc_a").join(fb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
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
                      n: int = SHINGLE_N,
                      max_df: int | None = MAX_SHINGLE_DF) -> str:
    """DuckDB mirror of ``ngram_jaccard_pairs`` including the df cap
    (candidates from cold shingles only; exact common recount)."""
    sh = shingles_sql("text", n)
    hot_filter = (
        f"""shingle NOT IN (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) > {max_df})"""
        if max_df is not None else "TRUE"
    )
    return f"""
        WITH sh AS (
            SELECT doc_id AS doc, unnest({sh}) AS shingle FROM {table}
        ),
        sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
        cold AS (SELECT * FROM sh WHERE {hot_filter}),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM cold a JOIN cold b
              ON a.shingle = b.shingle AND a.doc < b.doc
        ),
        common AS (
            SELECT c.doc_a, c.doc_b, count(*) AS common
            FROM cand c
            JOIN sh a ON a.doc = c.doc_a
            JOIN sh b ON b.doc = c.doc_b AND b.shingle = a.shingle
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(common AS DOUBLE)
                     / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE round(CAST(common AS DOUBLE)
                    / (sa.sz + sb.sz - common), 6) >= {threshold}
    """


# --------------------------------------------------------------------------
# Skew-blocked banded self-join (shared by LSH / SimHash / phash pairs)
# --------------------------------------------------------------------------

def banded_self_pairs(
    banded: DataFrame,
    band_cols: list,
    id_col: str,
    n_blocks: int = 1,
    extra_cols: tuple = (),
    first_band_cond=None,
    hot_threshold: int | None = None,
    op: str = "lsh",
) -> DataFrame:
    """Enumerate unordered within-bucket pairs of a banded table.

    A single dense bucket makes the naive self-join quadratic IN ONE
    TASK (observed: one 2.7k-row band bucket serializing the whole
    stage). With ``n_blocks`` = S, rows are hashed into S chunks and the
    bucket's pair space is enumerated as S*(S+1)/2 independent join
    blocks — same pair set, parallelism S^2/2 per hot bucket, left side
    replicated (S+1)/2 times. This is the salted-self-join skew pattern
    of the north rule applied to dedup.

    A pair sharing k bands would surface k times, classically collapsed
    by a final ``distinct()`` — a full shuffle of the candidate set.
    ``first_band_cond(a, b) -> Column``, when the caller can decide
    "this band is the pair's FIRST matching band" from the two joined
    rows alone (hash-banded schemes can: the full hash rides along),
    moves that dedup into the join predicate — each pair is emitted
    exactly once and the distinct shuffle disappears.

    ``hot_threshold``: when set (rows per bucket), only buckets LARGER
    than it are chunk-blocked; cold buckets join unreplicated. Block
    replication costs (S+1)/2 x the left shuffle, and skew blocking
    only pays for itself on the few dense buckets — the hot set is
    found with one bounded aggregation (<= total_rows / threshold
    buckets) and broadcast. None = block every bucket (legacy dial).
    Setting ``hot_threshold`` engages hot-bucket chunking even when
    ``n_blocks`` is 1 (hot buckets then use 8 chunks) — previously the
    dial was silently ignored without an explicit n_blocks.

    ``op`` namespaces the pinned-cache tag (``<op>_banded``), so two
    LSH operators composed into one lazy plan (e.g. minhash + simhash
    feeding near-dup clustering) don't unpin each other's banded frame
    before the action runs — a shared tag would silently re-execute the
    first arm's banding subtree per consumer.

    Both sides carry SHUFFLE_HASH hints: this is a self-join of
    equal-size tables, so a broadcast build (which Spark picks when
    the checkpointed side's stats read small) is never right — at
    scale the banded table is the full corpus x bands and would OOM
    the driver; observed 2x slower even at bench scale from the
    single-threaded 8M-row HashedRelation build.

    Returns columns id_a, id_b (+ a_<c>/b_<c> for extra_cols).
    """
    sel_a = [F.col(f"a.{id_col}").alias("id_a")] + [
        F.col(f"a.{c}").alias(f"a_{c}") for c in extra_cols]
    sel_b = [F.col(f"b.{id_col}").alias("id_b")] + [
        F.col(f"b.{c}").alias(f"b_{c}") for c in extra_cols]
    # A self-join re-executes the (expensive) banding subtree once per
    # side — and block replication amplifies it further. Materialize the
    # banded table once; it is tiny relative to its lineage (one row per
    # (id, band)).
    shuffle_n = int(banded.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    if n_blocks <= 1 and hot_threshold is None:
        # Unblocked path (caller expects no dense buckets): pin
        # partitioned BY THE BUCKET KEY. Both self-join sides then read
        # a layout that already satisfies the join's
        # ClusteredDistribution on the equi keys, so the join runs with
        # ZERO exchanges — the one pin-write shuffle replaces three
        # (round-robin pin + two join-side exchanges of corpus x
        # bands). Same stats-as-layout move as phash_pairs_grouped; a
        # genuinely dense bucket belongs on the blocked path below,
        # whose per-chunk exchanges are the skew spreaders.
        #
        # The eager count is load-bearing, not a stray action: with a
        # cached-but-unmaterialized adaptive plan, InMemoryTableScan's
        # output partitioning reads unknown at planning time and
        # EnsureRequirements re-adds both exchanges (measured; fresh
        # plans after materialization carry none). The cache write is
        # work the join's first run would do anyway.
        banded = _pin_fresh(f"{op}_banded",
                            banded.repartition(shuffle_n, *band_cols))
        banded.count()
        a = banded.hint("shuffle_hash").alias("a")
        b = banded.hint("shuffle_hash").alias("b")
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        for c in band_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        if first_band_cond is not None:
            cond = cond & first_band_cond("a", "b")
            return a.join(b, cond).select(*sel_a, *sel_b)
        return a.join(b, cond).select(*sel_a, *sel_b).distinct()

    # Blocked path. The join equi-keys are (bucket, chunk): the
    # exchanges on them are what spread a dense bucket's pair-space
    # across tasks, so they cannot simply be elided — but when the
    # block count is CONSTANT (no hot_threshold), the probe side's
    # chunk is computable before the pin, and pinning partitioned by
    # (bucket, chunk) + eager materialization (see the unblocked path
    # for why eager) hands the probe side its layout for free: one of
    # the two corpus x bands join exchanges disappears; the exploded
    # build side still shuffles, as it must (it is the replicated
    # spreader). With a hot_threshold the per-row block count comes
    # from a stats join on the pinned frame, so no layout can be
    # promised — there the pin only needs WIDTH; re-spread it just
    # when the banding lineage arrives narrow (same rule as
    # _ensure_parallelism; a blind repartition measured as one full
    # corpus x bands shuffle per call moving already-balanced rows).
    #
    # with n_blocks <= 1 but a hot_threshold set, hot buckets still
    # need a real block count for the chunking to do anything — use 8
    # (the grouped path's default); cold buckets stay unreplicated
    eff_blocks = n_blocks if n_blocks > 1 else 8
    if hot_threshold is None:
        banded = banded.withColumn("_c", F.pmod(
            F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int"))
        banded = _pin_fresh(
            f"{op}_banded",
            banded.repartition(shuffle_n, *band_cols, "_c"))
        banded.count()
        left = (banded.withColumn("_ca", F.col("_c"))
                .withColumn("_cb", F.explode(F.sequence(
                    F.col("_c"), F.lit(n_blocks - 1))))
                .drop("_c"))
        right = banded.withColumn("_cb", F.col("_c")).drop("_c")
    else:
        if banded.rdd.getNumPartitions() < shuffle_n:
            banded = banded.repartition(shuffle_n)
        banded = _pin_fresh(f"{op}_banded", banded)
        hot = (banded.groupBy(*band_cols).count()
               .filter(F.col("count") > hot_threshold)
               .select(*band_cols, F.lit(eff_blocks).alias("_nb")))
        banded = banded.join(F.broadcast(hot), band_cols, "left").withColumn(
            "_nb", F.coalesce(F.col("_nb"), F.lit(1)))
        chunk = F.pmod(F.xxhash64(F.col(id_col)), F.col("_nb")).cast("int")
        left = banded.withColumn("_ca", chunk).withColumn(
            "_cb", F.explode(F.sequence(F.col("_ca"), F.col("_nb") - 1)))
        right = banded.withColumn("_cb", chunk)
    left = left.hint("shuffle_hash")
    right = right.hint("shuffle_hash")
    a, b = left.alias("a"), right.alias("b")
    cond = F.col("a._cb") == F.col("b._cb")
    for c in band_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # each unordered pair exactly once: cross-chunk pairs ordered by
    # chunk, same-chunk pairs by id
    cond = cond & (
        (F.col("a._ca") < F.col("b._cb"))
        | ((F.col("a._ca") == F.col("b._cb"))
           & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    )
    if first_band_cond is not None:
        cond = cond & first_band_cond("a", "b")
    pairs = a.join(b, cond).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        *[F.when(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                 F.col(f"a.{c}")).otherwise(F.col(f"b.{c}")).alias(f"a_{c}")
          for c in extra_cols],
        *[F.when(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                 F.col(f"b.{c}")).otherwise(F.col(f"a.{c}")).alias(f"b_{c}")
          for c in extra_cols],
    )
    return pairs if first_band_cond is not None else pairs.distinct()


def _first_chunk_cond(hash_col: str, n_bands: int = 4, bits: int = 16):
    """first_band_cond for 64-bit-hash banding: the pair's first
    matching band is the lowest ``bits``-wide zero chunk of the XOR —
    computable from the two joined rows, fully native."""
    mask = (1 << bits) - 1

    def cond(a, b):
        x = F.col(f"{a}.{hash_col}").bitwiseXOR(F.col(f"{b}.{hash_col}"))
        fm = F.when(x.bitwiseAND(F.lit(mask)) == 0, 0)
        for i in range(1, n_bands):
            fm = fm.when(
                F.shiftrightunsigned(x, bits * i)
                .bitwiseAND(F.lit(mask)) == 0, i)
        return F.col(f"{a}.band") == fm

    return cond


def _first_key_cond(n_bands: int, key_fmt: str = "k{}"):
    """first_band_cond for keyed banding (e.g. MinHash band digests):
    both rows carry every per-band key as its own scalar column
    (``k0..k{n-1}``), so "this band is the pair's first match" lowers
    to a flat AND/OR chain of scalar comparisons — whole-stage-codegen
    native. The earlier array<string> + ``zip_with``/``array_position``
    formulation forced interpreted higher-order-function eval per
    candidate pair and shuffled an array of 4 md5 strings per banded
    row where 4 longs suffice. Strictly-interleaved A/B at bench scale
    (80k docs x 16 replication, local[32]) reads wall-NEUTRAL — the
    ~5 s wall there is pin-build + fixed join/stage cost, not
    predicate eval — so this is a shuffle-width (~60% narrower banded
    rows) and codegen-purity win that pays at corpus scale, not a
    bench-visible one."""
    def cond(a, b):
        c = F.col(f"{a}.band") == 0
        for i in range(1, n_bands):
            prior_ne = None
            for j in range(i):
                ka, kb = key_fmt.format(j), key_fmt.format(j)
                ne = F.col(f"{a}.{ka}") != F.col(f"{b}.{kb}")
                prior_ne = ne if prior_ne is None else (prior_ne & ne)
            c = c | ((F.col(f"{a}.band") == i) & prior_ne)
        return c

    return cond


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
    sh = _shingle_rows(docs, text_col, id_col, distinct=False).withColumn(
        "x", _shingle_int_col(F.col("shingle")))
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
                      id_col: str = "doc_id",
                      n_blocks: int = 1) -> DataFrame:
    """LSH candidate pairs: signatures banded (LSH_BANDS x LSH_ROWS);
    docs sharing any band-hash become a candidate pair. The band join is
    an equi-join on (band, band_key); ``n_blocks`` > 1 engages the
    skew-blocked self-join for dense buckets (identical pair set).

    Band keys are ``xxhash64`` longs over the band's signature values
    (one long join key + 4 long ride-along columns per banded row),
    not the oracle's md5 strings: key equality is h-tuple equality
    under either hash (collisions aside, the same ~2^-64 event class
    the banding scheme already accepts), the oracle's DISTINCT defines
    the pair set independent of WHICH band emitted it, and the native
    first-band predicate (:func:`_first_key_cond`) needs scalar
    comparisons, not string-array walks. Identical 665,280 pairs at
    bench scale; wall-neutral there (see :func:`_first_key_cond`) but
    strictly narrower shuffle rows for the corpus-size self-join."""
    sig = minhash_signatures(docs, text_col, id_col)
    kcols = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"h{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        kcols.append(F.xxhash64(*cols).alias(f"k{b}"))
    bands = [F.struct(F.lit(b).alias("band"),
                      F.col(f"k{b}").alias("key"))
             for b in range(LSH_BANDS)]
    kn = [f"k{b}" for b in range(LSH_BANDS)]
    banded = sig.select("doc", *kcols).select(
        "doc", *kn, F.explode(F.array(*bands)).alias("bk")
    ).select("doc", *kn, F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    pairs = banded_self_pairs(banded, ["band", "key"], "doc", n_blocks,
                              first_band_cond=_first_key_cond(LSH_BANDS),
                              op="minhash_lsh")
    return pairs.select(F.col("id_a").alias("doc_a"),
                        F.col("id_b").alias("doc_b"))


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
    tokens, sign -> bit. Arrow-batched. Token-less (empty/whitespace-
    only/NULL) documents yield NULL — a signature of 0 would spuriously
    pair every empty doc at hamming 0, and the SQL mirror's unnest
    produces no rows for them.

    The md5 runs once per UNIQUE token per batch (stopwords repeat
    constantly, so the vocabulary is far smaller than the token
    stream); each unique token's +-1 bit row is materialized once and
    per-document signatures become one fancy-indexed row-sum — the
    token-bound Python inner loop of round 1 replaced by two numpy
    passes (identical output values)."""
    import hashlib
    import re

    # the shared tokenizer contract is split-on-ASCII-\s+ (Spark's Java
    # regex \s and DuckDB/RE2's \s are both ASCII-only); Python's bare
    # str.split() splits on UNICODE whitespace (e.g. U+00A0) and would
    # diverge from tokens_col/tokens_sql on scraped web text
    ws = re.compile(r"\s+", re.ASCII)
    out = np.full(len(text), None, dtype=object)
    tok_lists = []
    vocab: dict = {}
    for t in text:
        toks = [w for w in ws.split((t or "").lower()) if w]
        tok_lists.append(toks)
        for w in toks:
            if w not in vocab:
                vocab[w] = len(vocab)
    if not vocab:
        return pd.Series(out)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in vocab),
        dtype=np.uint64, count=len(vocab))
    shifts = np.arange(64, dtype=np.uint64)
    # (vocab, 64) matrix of +-1 bit contributions
    pm = (((hs[:, None] >> shifts[None, :]) & np.uint64(1))
          .astype(np.int64) * 2 - 1)
    for i, toks in enumerate(tok_lists):
        if not toks:
            continue
        idx = np.fromiter((vocab[w] for w in toks), dtype=np.int64,
                          count=len(toks))
        # NOT pm[idx].sum(axis=0): that fancy-index materializes a
        # (tokens x 64) int64 copy — 512 B per token OCCURRENCE, ~5 GB
        # for one 10M-token concatenated-dump poison row. Weighted sum
        # over the doc's UNIQUE tokens instead (identical integer
        # result), chunked so the transient stays < ~130 MB.
        u, c = np.unique(idx, return_counts=True)
        acc = np.zeros(64, dtype=np.int64)
        step = 1 << 18
        for s in range(0, len(u), step):
            acc += (c[s:s + step, None]
                    * pm[u[s:s + step]]).sum(axis=0)
        bits = (acc > 0).astype(np.uint64)
        val = int((bits << shifts).sum(dtype=np.uint64))
        if val >= 1 << 63:
            val -= 1 << 64
        out[i] = val
    return pd.Series(out)


def simhash_pairs_sql(table: str = "documents",
                      max_hamming: int = 8) -> str:
    """DuckDB mirror of simhash64 + banded pairs: md5-prefix 64-bit
    token hashes, per-bit +-1 accumulation, sign -> bit; bands are the
    16-bit chunks; pairs deduped by DISTINCT (set-equal to the Spark
    side's first-matching-band emission)."""
    toks = tokens_sql("text")
    two63, two64 = 1 << 63, 1 << 64
    return f"""
        WITH tok AS (
            SELECT doc_id AS doc, unnest({toks}) AS t FROM {table}
        ),
        th AS (
            SELECT doc,
                   CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS h
            FROM tok
        ),
        bits AS (
            SELECT doc, b.b,
                   sum(CASE WHEN (h >> CAST(b.b AS UBIGINT))
                                 & CAST(1 AS UBIGINT) = 1
                       THEN 1 ELSE -1 END) AS acc
            FROM th, (SELECT unnest(generate_series(0, 63)) AS b) b
            GROUP BY doc, b.b
        ),
        sim AS (
            SELECT doc,
                   sum(CASE WHEN acc > 0
                       THEN CAST(1 AS HUGEINT) << CAST(b AS INT)
                       ELSE 0 END) AS uval
            FROM bits GROUP BY doc
        ),
        banded AS (
            SELECT doc, uval, b.band,
                   CAST((uval >> CAST(16 * b.band AS INT)) % 65536
                        AS BIGINT) AS key
            FROM sim, (SELECT unnest([0, 1, 2, 3]) AS band) b
        )
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
               bit_count(xor(CAST(CASE WHEN a.uval >= {two63}
                                  THEN a.uval - {two64}
                                  ELSE a.uval END AS BIGINT),
                             CAST(CASE WHEN b.uval >= {two63}
                                  THEN b.uval - {two64}
                                  ELSE b.uval END AS BIGINT))) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
        WHERE bit_count(xor(CAST(CASE WHEN a.uval >= {two63}
                                 THEN a.uval - {two64}
                                 ELSE a.uval END AS BIGINT),
                            CAST(CASE WHEN b.uval >= {two63}
                                 THEN b.uval - {two64}
                                 ELSE b.uval END AS BIGINT)))
              <= {max_hamming}
    """


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_blocks: int = 1) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, banded on 16-bit
    chunks (pigeonhole-complete for d <= 3 with 4 bands; a recall/cost
    dial above). Band equi-join + native bit_count(xor) refine; dense
    buckets parallelize via the skew-blocked self-join."""
    docs = _ensure_parallelism(docs, id_col)
    sh = docs.select(F.col(id_col).alias("doc"),
                     simhash64(F.col(text_col)).alias("sim"))
    sh = sh.filter(F.col("sim").isNotNull())  # token-less docs never pair
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("sim"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)
    ])
    banded = sh.select("doc", "sim", F.explode(bands).alias("bk")).select(
        "doc", "sim", "bk.band", "bk.key")
    pairs = banded_self_pairs(banded, ["band", "key"], "doc", n_blocks,
                              extra_cols=("sim",),
                              first_band_cond=_first_chunk_cond("sim"),
                              op="simhash")
    return (
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"),
            F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim")))
            .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (exact baseline + the oracle-checked form)
# --------------------------------------------------------------------------

def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           max_rows: int | None = 200_000) -> DataFrame:
    """Exact all-pairs cosine >= threshold. Join-on-inequality (id<id)
    — the correctness baseline; the scale path buckets by hyperplane
    LSH first (see similarity.lsh_cosine_pairs). Dot/norm stay native
    (zip_with + aggregate = JVM codegen).

    SIZE-GATED: the O(n²) theta join is an oracle anchor, not a path a
    pipeline should reach at scale — above ``max_rows`` input rows it
    raises and points at ``similarity.lsh_cosine_pairs`` (bucketed
    candidates + exact refine, same pair semantics). Pass
    ``max_rows=None`` to bypass the gate deliberately."""
    if max_rows is not None:
        n = emb.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_cosine_pairs is the exact O(n^2) baseline "
                f"({n} rows > max_rows={max_rows}); use "
                f"similarity.lsh_cosine_pairs for the bucketed scale "
                f"path, or pass max_rows=None to force the all-pairs "
                f"join.")
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("norm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))
    # zero-norm guard: cosine would be 0/0 = NaN, and Spark's ordering
    # semantics treat NaN as GREATER than any double — one all-zero
    # embedding (a failed embed call) would otherwise pair with every
    # row and collapse the corpus into one near-dup cluster
    v = v.filter(F.col("norm") > 0)
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
    """Mirror of ``embedding_cosine_pairs``: same zero-norm exclusion,
    and the threshold tests the ROUNDED cosine exactly as the engine
    filters its round(..., 6) column."""
    cos = (
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[]))"
    )
    def norm2(side: str) -> str:
        return (f"list_dot_product(CAST({side}.embedding AS DOUBLE[]), "
                f"CAST({side}.embedding AS DOUBLE[]))")
    return f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({cos}, 6) AS cosine
        FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
        WHERE {norm2('a')} > 0 AND {norm2('b')} > 0
          AND round({cos}, 6) >= {threshold}
    """


# --------------------------------------------------------------------------
# Image phash near-dup (hamming banding, fully native)
# --------------------------------------------------------------------------

def phash_pairs(images: DataFrame, max_hamming: int = 6,
                id_col: str = "image_id",
                phash_col: str = "phash",
                n_blocks: int = 1,
                hot_threshold: int | None = 4096,
                strategy: str = "grouped") -> DataFrame:
    """Near-duplicate images by perceptual-hash hamming distance,
    16-bit-band blocked (pigeonhole-complete for max_hamming <= 3; a
    recall/cost dial above that).

    Two differential-tested physical strategies produce the identical
    pair set:

    * ``"grouped"`` (default) — bucket-grouped vectorized numpy
      evaluation (:func:`phash_pairs_grouped`): candidates never
      materialize as rows, ~2x faster at bench scale and shuffles only
      corpus x bands;
    * ``"join"`` — the fully Catalyst-native banded self-join
      (shuffle-hash, hot-bucket chunk blocking, first-band dedup in
      the join predicate); zero Python nodes, and the 1:1 mirror of
      the SQL oracle's formulation.
    """
    if strategy == "grouped":
        # hot_threshold=None means "block every bucket" in the join
        # path; the grouped analogue is threshold 0 (every non-empty
        # bucket is hot). 0 itself must NOT coerce to the default.
        return phash_pairs_grouped(
            images, max_hamming, id_col, phash_col,
            n_blocks=max(n_blocks, 2),
            hot_threshold=0 if hot_threshold is None else hot_threshold)
    if strategy != "join":
        raise ValueError(f"unknown phash_pairs strategy {strategy!r}")
    base = images.select(F.col(id_col).alias("img"),
                         F.col(phash_col).alias("ph"))
    base = base.filter(F.col("ph").isNotNull())
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("ph"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)
    ])
    banded = base.select("img", "ph", F.explode(bands).alias("bk")).select(
        "img", "ph", "bk.band", "bk.key")
    pairs = banded_self_pairs(banded, ["band", "key"], "img", n_blocks,
                              extra_cols=("ph",),
                              first_band_cond=_first_chunk_cond("ph"),
                              hot_threshold=hot_threshold,
                              op="phash_join")
    return (
        pairs.select(
            F.col("id_a").alias("img_a"), F.col("id_b").alias("img_b"),
            F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph")))
            .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


_POPCNT16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                     dtype=np.uint8)


def _hamming64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of int64/uint64 xor values (16-bit LUT over
    a raw uint16 reinterpretation — no shift/mask temporaries; ~3x the
    shift-ladder formulation at 4M elements)."""
    v = _POPCNT16[np.ascontiguousarray(x).view(np.uint16)].reshape(-1, 4)
    return ((v[:, 0] + v[:, 1]) + (v[:, 2] + v[:, 3])).astype(np.int32)


def _first_zero_chunk(x: np.ndarray) -> np.ndarray:
    """Lowest 16-bit-aligned zero chunk of each xor value — the pair's
    first matching band (numpy mirror of _first_chunk_cond). Values
    with NO zero chunk return 3, matching the shift-ladder original
    (within-bucket candidates always have one: the bucket's own band)."""
    z = np.ascontiguousarray(x).view(np.uint16).reshape(-1, 4) == 0
    # argmax yields the first True; all-False rows yield 0 -> force 3
    return np.where(z.any(axis=1), np.argmax(z, axis=1), 3)


def _emit_pairs(ids, left, right, phs, band, max_hamming):
    """Filter candidate (left, right) index pairs over (ids, phs) rows
    to first-matching-band hamming survivors; returns an ordered
    (img_a, img_b, hamming) DataFrame.

    Takes row arrays + index pairs (not pre-gathered sides) so the id
    gather — object-dtype for string ids — runs only on hamming/band
    survivors (a few % of candidates), never on the full candidate set.
    """
    x = np.bitwise_xor(phs[left], phs[right])
    ham = _hamming64(x)
    keep = ham <= max_hamming
    if not keep.any():
        return None
    sub = _first_zero_chunk(x[keep]) == band
    ham = ham[keep][sub]
    li, ri = left[keep][sub], right[keep][sub]
    il, ir = ids[li], ids[ri]
    # il != ir keeps the contract identical to the join strategy and
    # the SQL oracle (strict a.id < b.id: duplicate-id rows never
    # self-pair)
    neq = il != ir
    if not neq.all():
        il, ir, ham = il[neq], ir[neq], ham[neq]
    if il.size == 0:
        return None
    lt = il < ir
    return pd.DataFrame({
        "img_a": np.where(lt, il, ir),
        "img_b": np.where(lt, ir, il),
        "hamming": ham,
    })


def _triangle_indices(counts: np.ndarray):
    """All within-segment (i < j) index pairs for contiguous segments
    of the given sizes, fully vectorized: for each global row, pair it
    with every later row of its segment."""
    n = int(counts.sum())
    ends = np.cumsum(counts)
    starts = ends - counts
    seg_of = np.repeat(np.arange(len(counts)), counts)
    after = ends[seg_of] - np.arange(n) - 1  # rows after me in my seg
    left = np.repeat(np.arange(n), after)
    if left.size == 0:
        return left, left
    run_starts = np.cumsum(after) - after
    right = (np.arange(left.size) - run_starts[left]) + left + 1
    return left, right


def phash_pairs_grouped(images: DataFrame, max_hamming: int = 6,
                        id_col: str = "image_id",
                        phash_col: str = "phash",
                        n_blocks: int = 8,
                        hot_threshold: int = 4096,
                        group_fan: int = 256) -> DataFrame:
    """:func:`phash_pairs` with bucket-grouped vectorized evaluation —
    the same pair set (differential-tested), a different physical plan.

    The join formulation must emit every within-bucket candidate as a
    join output row before filtering: ~130M row emissions at bench
    scale, ~0.6us each of join-row handling — the measured floor. Here
    candidates never become rows: buckets are grouped (cold buckets
    coalesced ``group_fan`` ways so per-group Arrow overhead amortizes,
    hot buckets chunk-blocked like the join path) and the
    hamming/first-band evaluation runs as numpy popcount over
    vectorized triangle/bipartite index enumeration — tens of ops per
    candidate instead of a join-row lifecycle. Shuffle volume drops
    from (corpus x bands x replication + all candidates) to
    (corpus x bands) only.

    Scale shape: cold groups are bounded by ``group_fan`` x bucket
    cap; hot buckets split into (S+1)S/2 chunk-pair tasks bounded by
    ``hot_threshold``-ish chunk sizes, exactly like the join path.

    Two physical-plan decisions are made from MEASURED stats on the
    pinned banded table (the same move AQE makes from shuffle stats):

    * the pin is hash-partitioned by the cold path's grouping key
      ``(band, kg)``, which satisfies the grouped-eval's
      ClusteredDistribution — the cold ``applyInPandas`` reads pinned
      partitions with NO further exchange, replacing the previous
      round-robin pin + full corpus x bands re-shuffle (one exchange
      total instead of two). A pathologically hot band value makes
      that one pin-write task large (the frame still spills to disk;
      the hot EVAL still redistributes by chunk pair), which is the
      usual layout-vs-balance trade and is bounded below by the
      anti-join that keeps hot rows out of every cold group;
    * the hot-bucket count is evaluated eagerly (one bounded action —
      at most banded_rows / hot_threshold buckets can exceed the
      threshold). When it is ZERO — the common case for a well-spread
      hash at production thresholds — the anti-join and the entire
      hot branch (semi-join, chunk explode, second shuffle) vanish
      from the plan instead of scanning corpus x bands twice to
      produce nothing.
    """
    id_type = images.schema[id_col].dataType.simpleString()
    out_schema = f"img_a {id_type}, img_b {id_type}, hamming int"

    base = images.select(F.col(id_col).alias("img"),
                         F.col(phash_col).alias("ph"))
    # NULL phashes can never pair (the join strategy's NULL band keys
    # never equi-match) — and to_numpy(dtype=int64) on a None would
    # crash the Arrow groups, so drop them up front
    base = base.filter(F.col("ph").isNotNull())
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("ph"), 16 * i)
                 .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for i in range(4)
    ])
    banded = base.select("img", "ph", F.explode(bands).alias("bk")).select(
        "img", "ph", "bk.band", "bk.key")
    banded = banded.withColumn("kg", F.pmod(
        F.xxhash64("key"), F.lit(group_fan)).cast("int"))
    shuffle_n = int(banded.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"))
    # pin partitioned by the cold grouping key (see docstring): the
    # grouped eval's ClusteredDistribution(band, kg) is satisfied by
    # hashpartitioning(band, kg, shuffle_n), so no second exchange
    banded = _pin_fresh("phash_grouped_banded",
                        banded.repartition(shuffle_n, "band", "kg"))

    hot = (banded.groupBy("band", "key").count()
           .filter(F.col("count") > hot_threshold)
           .select("band", "key"))
    # eager, bounded stats action deciding the skew strategy; pinned
    # under the SAME tag (appended, not fresh — _pin_fresh here would
    # release the banded pin) so both branches below read the computed
    # bucket list instead of re-aggregating corpus x bands twice
    from pyrosm_spark.operators.spatial_join import _pin
    hot = _pin("phash_grouped_banded", hot)
    n_hot = hot.count()

    def eval_cold(pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(pdf["band"].iat[0])
        order = np.argsort(pdf["key"].to_numpy(), kind="stable")
        keys = pdf["key"].to_numpy()[order]
        ids = pdf["img"].to_numpy()[order]
        phs = pdf["ph"].to_numpy(dtype=np.int64)[order]
        _uniq, counts = np.unique(keys, return_counts=True)
        left, right = _triangle_indices(counts)
        out = _emit_pairs(ids, left, right, phs, band, max_hamming)
        return out if out is not None else pd.DataFrame(
            {"img_a": [], "img_b": [], "hamming": []})

    cold_rows = banded if n_hot == 0 else banded.join(
        F.broadcast(hot), ["band", "key"], "left_anti")
    cold = (cold_rows.groupBy("band", "kg")
            .applyInPandas(eval_cold, out_schema))
    if n_hot == 0:
        return cold

    def eval_hot(pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(pdf["band"].iat[0])
        ga, gb = int(pdf["ga"].iat[0]), int(pdf["gb"].iat[0])
        ids = pdf["img"].to_numpy()
        phs = pdf["ph"].to_numpy(dtype=np.int64)
        cs = pdf["c"].to_numpy()
        if ga == gb:
            sel = np.flatnonzero(cs == ga)
            left, right = _triangle_indices(
                np.array([sel.size], dtype=np.int64))
            left, right = sel[left], sel[right]
        else:
            a = np.flatnonzero(cs == ga)
            b = np.flatnonzero(cs == gb)
            left = np.repeat(a, b.size)
            right = np.tile(b, a.size)
        out = _emit_pairs(ids, left, right, phs, band, max_hamming)
        return out if out is not None else pd.DataFrame(
            {"img_a": [], "img_b": [], "hamming": []})

    chunk = F.pmod(F.xxhash64("img"), F.lit(n_blocks)).cast("int")
    hot_rows = (banded.join(F.broadcast(hot), ["band", "key"],
                            "left_semi")
                .withColumn("c", chunk)
                .withColumn("x", F.explode(F.sequence(
                    F.lit(0), F.lit(n_blocks - 1))))
                .withColumn("ga", F.least("c", "x"))
                .withColumn("gb", F.greatest("c", "x"))
                .drop("x")
                .groupBy("band", "key", "ga", "gb")
                .applyInPandas(eval_hot, out_schema))

    return cold.unionByName(hot_rows)


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


def near_dup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """The dedup pipeline's FINAL step (Lee et al. 2022 keep-one-per-
    cluster): candidate pairs (from MinHash-LSH / SimHash / phash /
    embedding banding) become connected components, every document maps
    to its cluster's canonical (minimum) id, and ``is_duplicate`` marks
    the rows a training run drops. Components run distributed
    (operators.graph.connected_components — contraction with the
    recursion guard), so a planet-scale near-dup graph never touches
    the driver. Passing ``docs`` includes the non-paired documents as
    their own singletons (the usual 'full table out' contract)."""
    from pyrosm_spark.operators.graph import connected_components

    comp = connected_components(pairs, a_col, b_col)
    out = comp.select(
        F.col("node").alias(id_col),
        F.col("comp").alias("canonical_id"),
        (F.col("node") != F.col("comp")).alias("is_duplicate"),
    )
    if docs is not None:
        singles = (
            docs.select(F.col(id_col))
            .join(out.select(id_col), id_col, "left_anti")
            .select(
                id_col,
                F.col(id_col).alias("canonical_id"),
                F.lit(False).alias("is_duplicate"),
            )
        )
        out = out.unionByName(singles)
    return out


def near_dup_clusters_sql(table: str = "documents") -> str:
    """DuckDB mirror: recursive min-label closure over the MinHash-LSH
    pair set (the same oracle pattern as largest_weak_component)."""
    pairs = minhash_lsh_pairs_sql(table)
    return f"""
        WITH RECURSIVE pairs AS ({pairs}),
        und AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(node, label) AS (
            SELECT a, a FROM und
            UNION
            SELECT u.b, r.label FROM reach r JOIN und u ON u.a = r.node
        ),
        comp AS (SELECT node, min(label) AS canon FROM reach GROUP BY node)
        SELECT d.doc_id,
               coalesce(c.canon, d.doc_id) AS canonical_id,
               coalesce(c.canon, d.doc_id) != d.doc_id AS is_duplicate
        FROM {table} d LEFT JOIN comp c ON c.node = d.doc_id
    """
