"""Text-analysis operators for training-data pipelines.

New functionality beyond the reference (mandated by the task brief):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. Every operator is pure Catalyst (no UDF) and each has
an exactly-mirrored ANSI-SQL form so DuckDB can oracle-check it — the
definitions below ARE the spec both engines implement.

Tokenizer contract (shared by all ops):
    tokens(text) = non-empty pieces of split(lower(trim(text)), '\\s+')
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword lang-ID
# heuristic (deterministic; same lists are baked into the SQL oracle).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "es", "un", "una", "por", "como"],
}

PUNCT_CLASS = r"[!?.,;:]"


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def punct_ratio_col(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    return F.when(n > 0,
                  F.regexp_count(text, F.lit(PUNCT_CLASS)) / n).otherwise(0.0)


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are (distinct) stopword hits / token count."""
    toks = tokens_col(text)
    hits = F.size(F.array_intersect(toks, F.lit(LANG_STOPWORDS[lang]).cast(
        "array<string>")))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(0.0)


def lang_scores(text: Column) -> dict:
    """Per-language score = number of DISTINCT stopwords present."""
    toks = F.array_distinct(tokens_col(text))
    return {
        lang: F.size(F.array_intersect(toks, F.lit(words).cast("array<string>")))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id_col(text: Column) -> Column:
    """Argmax language by stopword score; 'und' (undetermined) when all
    scores are 0. Ties break by the fixed language order en>de>fr>es."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in LANG_STOPWORDS:  # insertion order = tiebreak order
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set —
    detects shuffled/duplicated-content docs regardless of word order."""
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return F.md5(F.array_join(toks, " "))


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punct + stopword
    presence. A deterministic toy of the C4/Gopher-style filters."""
    n_tok = token_count_col(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio_col(text) < 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio_col(text, "en") > 0.01, 1.0).otherwise(0.0)
    return (len_ok + punct_ok + stop_ok) / 3.0


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count_col(t).alias("n_tokens"),
        F.length(t).alias("n_chars_computed"),
        F.round(punct_ratio_col(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(t), 6).alias("stopword_ratio"),
        lang_id_col(t).alias("lang_pred"),
        fingerprint_col(t).alias("fingerprint"),
        F.round(quality_score_col(t), 6).alias("quality"),
    )


# --------------------------------------------------------------------------
# SQL mirrors (DuckDB oracle builders)
# --------------------------------------------------------------------------

def tokens_sql(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower(trim({text})), '\\s+'), "
        f"x -> x != '')"
    )


def _stop_list_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang]) + "]"


def lang_id_sql(text: str) -> str:
    toks = f"list_distinct({tokens_sql(text)})"
    scores = {
        lang: f"len(list_intersect({toks}, {_stop_list_sql(lang)}))"
        for lang in LANG_STOPWORDS
    }
    # same sequential argmax with same tiebreak order
    expr = "'und'"
    best = "0"
    for lang in LANG_STOPWORDS:
        s = scores[lang]
        expr = f"(CASE WHEN {s} > {best} THEN '{lang}' ELSE {expr} END)"
        best = f"(CASE WHEN {s} > {best} THEN {s} ELSE {best} END)"
    return expr


def analyze_documents_sql(table: str = "documents") -> str:
    toks = tokens_sql("text")
    stop_en = _stop_list_sql("en")
    punct = (
        "(CASE WHEN length(text) > 0 THEN "
        "CAST(length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS DOUBLE)"
        " / length(text) ELSE 0.0 END)"
    )
    stop_ratio = (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_intersect({toks}, {stop_en})) AS DOUBLE) / len({toks}) "
        f"ELSE 0.0 END)"
    )
    quality = (
        f"((CASE WHEN len({toks}) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END) +"
        f" (CASE WHEN {punct} < 0.1 THEN 1.0 ELSE 0.0 END) +"
        f" (CASE WHEN {stop_ratio} > 0.01 THEN 1.0 ELSE 0.0 END)) / 3.0"
    )
    return f"""
        SELECT doc_id,
               len({toks}) AS n_tokens,
               length(text) AS n_chars_computed,
               round({punct}, 6) AS punct_ratio,
               round({stop_ratio}, 6) AS stopword_ratio,
               {lang_id_sql('text')} AS lang_pred,
               md5(array_to_string(list_sort(list_distinct({toks})), ' '))
                   AS fingerprint,
               round({quality}, 6) AS quality
        FROM {table}
    """
