"""Text-analysis primitives for the training-data pipeline layer.

All operators are Catalyst-expressible (no Python on the hot path): shingling
via ``transform(sequence(...))`` higher-order functions, hashing via
``md5``, counting via ``regexp_replace``/``replace`` length arithmetic. Each
has a deterministic ANSI-SQL twin for the DuckDB oracle — integer outputs
only (no float formatting hazards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words: scored by occurrence count; ties resolved by this
# fixed priority order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and "],
    "de": [" der ", " und "],
    "fr": [" les ", " est "],
    "es": [" los ", " que "],
}

STOPWORDS = [" the ", " a ", " of ", " to ", " and "]


def occurrences_expr(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via the replace-length trick —
    portable to any SQL dialect, stays in codegen."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def occurrences_sql(text_sql: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({text_sql}) - length(replace({text_sql}, '{esc}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (split on single space, empties included —
    identical to DuckDB ``len(string_split(text, ' '))``)."""
    return F.size(F.split(text, " ", -1)).cast("long")


def char_class_count_expr(text: Column, char_class: str) -> Column:
    """Count of characters matching a regex class, via strip-and-measure."""
    return F.length(F.regexp_replace(text, f"[^{char_class}]", "")).cast("long")


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, s): distinct character n-grams per document. Documents
    shorter than n characters produce no rows (both engines agree).

    The input is fanned out to cluster parallelism first (scale-adaptive
    no-op on real corpora): the n-gram explode multiplies each row by
    ~|text|, so a single-split scan would run the whole expansion on one
    core (guide §2.5 input skew)."""
    from ..session import parallelize_scan

    return (
        parallelize_scan(df).filter(F.length(text_col) >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length({text_col}) - {n - 1}),"
                        f" i -> substr({text_col}, i, {n}))"
                    )
                )
            ).alias("s"),
        )
    )


def shingles_sql(n: int = 3) -> str:
    # scalar generate_series returns a LIST, so it can reference text
    # (the table-function form cannot take lateral column parameters)
    return (
        f"SELECT doc_id, unnest(list_distinct(list_transform("
        f"generate_series(1, length(text) - {n - 1}),"
        f" g -> substr(text, g, {n})))) AS s "
        f"FROM documents WHERE length(text) >= {n}"
    )


def minhash_signature(sh: DataFrame, k: int = 4) -> DataFrame:
    """k-permutation MinHash via lexicographic-min of salted md5 hex — a
    random-permutation proxy that is bit-identical across engines (no
    hex→int conversion needed)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("s")).cast("binary"))).alias(
            f"h{j}"
        )
        for j in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signature_sql(k: int = 4, shingle_n: int = 3) -> str:
    cols = ", ".join(
        f"min(md5('{j}:' || s)) AS h{j}" for j in range(k)
    )
    return (
        f"SELECT doc_id, {cols} FROM ({shingles_sql(shingle_n)}) sh GROUP BY doc_id"
    )
