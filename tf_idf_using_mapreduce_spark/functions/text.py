"""Text normalization + tokenization (SURVEY.md §2.2 P1-P4).

The reference normalizes per line with ``toLowerCase()`` (P1,
``DocumentFreq.java:61``), strips ``[^a-zA-Z ]`` (P2, ``DocumentFreq.java:62``)
and splits on ``[^\\w']+`` (P3, ``DocumentFreq.java:63``). Post-P2 that is
equivalent to extracting maximal ``[a-z]+`` runs, which is what the engine's
canonical tokenizer does — in ONE portable expression usable verbatim by both
Spark SQL and the DuckDB oracle (``regexp_extract_all`` with an explicit group
index, the only form both dialects share).

Documented divergence: the reference *first* deletes non-letters then splits,
so ``"ab1cd"`` glues to one token ``abcd``; the canonical extractor yields
``ab, cd``. Identical on all-letter corpora (the fixtures).
:func:`normalize_strip` provides the exact-fidelity two-step form for Spark
pipelines that need it.

Stop-word filtering (P4, ``DocumentFreq.java:66-68``) applies to the RAW token
*before* stemming (quirk Q2) and is expressed as ``NOT IN (stop-list)`` —
Catalyst folds the 355-literal list into an efficient predicate; for very large
stop-lists :func:`anti_join_stopwords` gives the broadcast left-anti-join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import stopwords, stopwords_sql_list

# One portable tokenizer expression: maximal lowercase-letter runs.
TOKENIZE_SQL = "regexp_extract_all(lower({col}), '([a-z]+)', 1)"


def tokens_array(text_col: str = "text") -> F.Column:
    """Array<string> of tokens, JVM-side."""
    return F.expr(TOKENIZE_SQL.format(col=text_col))


def explode_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                   case_sensitive: bool = False) -> DataFrame:
    """(id, token) rows. ``case_sensitive`` mirrors the reference's
    ``-casesensitive`` flag (P1; lowercasing is the default)."""
    pat = "([a-zA-Z]+)" if case_sensitive else "([a-z]+)"
    src = text_col if case_sensitive else f"lower({text_col})"
    arr = F.expr(f"regexp_extract_all({src}, '{pat}', 1)")
    return df.select(F.col(id_col), F.explode(arr).alias("token"))


def filter_stopwords(df: DataFrame, token_col: str = "token") -> DataFrame:
    """P4/J2: drop stop-list tokens (raw token, pre-stem — quirk Q2)."""
    return df.where(~F.col(token_col).isin(*stopwords()))


def anti_join_stopwords(df: DataFrame, token_col: str = "token") -> DataFrame:
    """Broadcast left-anti-join form of P4 — the shape you want when the
    stop-list is itself a table too big for a literal predicate."""
    spark = df.sparkSession
    stop_df = spark.createDataFrame([(s,) for s in stopwords()], f"{token_col} string")
    return df.join(F.broadcast(stop_df), token_col, "left_anti")


def normalize_strip(df: DataFrame, text_col: str = "text", case_sensitive: bool = False) -> DataFrame:
    """Exact-fidelity P1+P2: lowercase then delete ``[^a-zA-Z ]`` (keeps the
    reference's fragment-gluing behavior)."""
    col = F.col(text_col) if case_sensitive else F.lower(F.col(text_col))
    return df.withColumn(text_col, F.regexp_replace(col, "[^a-zA-Z ]", ""))


# ---------------------------------------------------------------------------
# Oracle-side SQL builders (DuckDB dialect for the explode step only; the
# tokenizer expression itself is shared with Spark via TOKENIZE_SQL)
# ---------------------------------------------------------------------------

def tokens_cte_duckdb(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", filter_stop: bool = True) -> str:
    """DuckDB SELECT producing (id, token) — unnest replaces explode."""
    tok = TOKENIZE_SQL.format(col=text_col)
    sql = f"SELECT {id_col}, unnest({tok}) AS token FROM {table}"
    if filter_stop:
        sql = f"SELECT {id_col}, token FROM ({sql}) rawtoks WHERE token NOT IN {stopwords_sql_list()}"
    return sql
