"""Snippet extraction: the retrieval-stack step after top-k — show WHERE
the query hit. Pure built-in Columns (whole-stage codegen, no Python):

    snippet_col(text, terms, window) →
        the token window around the FIRST occurrence of the earliest-
        occurring query term, joined by single spaces, with matched terms
        wrapped in [brackets].

Determinism is pinned so the DuckDB oracle can re-derive it exactly:
- tokens come from THE pinned tokenizer (tokens_col);
- the anchor is min over query terms of array_position (first hit);
- the window is tokens[max(1, anchor-w) .. anchor+w] (1-based slice);
- highlighting wraps every window token that equals ANY query term.

The reference has no text surface at all (vectors in, ids out,
/root/reference/src/core/node.rs:93-97); this is part of the fulltext
upgrade the north_star asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hora_spark.functions.tokenize import tokens_col


def _first_hit_col(toks: Column, terms: list[str]) -> Column:
    """1-based position of the earliest first-occurrence among terms;
    NULL when no term occurs."""
    hits = F.array(*[F.array_position(toks, F.lit(t)) for t in terms])
    nz = F.filter(hits, lambda p: p > 0)
    return F.when(F.size(nz) > 0, F.array_min(nz))


def snippet_col(text: Column, terms: list[str], window: int = 5,
                unicode: bool = False) -> Column:
    """Highlighted snippet string, or NULL when no term occurs."""
    toks = tokens_col(text, unicode=unicode)
    anchor = _first_hit_col(toks, terms)
    start = F.greatest(anchor - F.lit(window), F.lit(1))
    # slice length start..anchor+window inclusive
    length = anchor + F.lit(window) - start + F.lit(1)
    win = F.slice(toks, start, length)
    term_arr = F.array(*[F.lit(t) for t in terms])
    marked = F.transform(
        win,
        lambda t: F.when(F.array_contains(term_arr, t),
                         F.concat(F.lit("["), t, F.lit("]"))).otherwise(t),
    )
    return F.when(anchor.isNotNull(), F.concat_ws(" ", marked))


def with_snippets(df: DataFrame, query_terms: list[str], text_col: str = "text",
                  window: int = 5, unicode: bool = False,
                  out_col: str = "snippet") -> DataFrame:
    """Attach a snippet column for the given query terms (typically the
    ≤ k·|queries| rows coming back from search_with_text — driver-tiny,
    but the expression is row-parallel and works at any scale)."""
    return df.withColumn(
        out_col, snippet_col(F.col(text_col), query_terms, window, unicode)
    )


def snippet_sql(text_expr: str, terms: list[str], window: int = 5) -> str:
    """The DuckDB twin of snippet_col (ASCII tokenizer) — used by the
    driver oracle; kept adjacent so the two stay in lockstep."""
    toks = ("list_filter(string_split_regex(lower(coalesce(" + text_expr
            + ", '')), '[^a-z0-9]+'), x -> x <> '')")
    hits = ("list_filter([" +
            ", ".join(f"list_position({toks}, '{t}')" for t in terms) +
            "], p -> p > 0)")
    term_list = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    anchor = f"list_min({hits})"
    start = f"greatest({anchor} - {window}, 1)"
    stop = f"{anchor} + {window}"
    return (
        f"CASE WHEN len({hits}) > 0 THEN "
        f"array_to_string(list_transform({toks}[{start}:{stop}], "
        f"t -> CASE WHEN list_contains({term_list}, t) "
        f"THEN '[' || t || ']' ELSE t END), ' ') END"
    )
