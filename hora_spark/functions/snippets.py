"""Snippet extraction: the retrieval-stack step after top-k — show WHERE
the query hit. Pure built-in Columns (whole-stage codegen, no Python):

    snippet_col(text, terms, window) →
        the token window around the BEST anchor — the query-term
        occurrence whose surrounding window contains the most query-term
        occurrences — joined by single spaces, with matched terms wrapped
        in [brackets].

Determinism is pinned so the DuckDB oracle can re-derive it exactly:
- tokens come from THE pinned tokenizer (tokens_col);
- hits = 1-based positions p with tokens[p] ∈ terms;
- window_score(p) = |{q ∈ hits : |q − p| ≤ w}| — the summed query-term
  contribution of the window centered at p (count-weighted: per-term idf
  weighting is NOT applied, keeping the expression corpus-stat-free and
  twin-derivable from the text alone);
- the anchor is the EARLIEST hit attaining the maximum window_score
  (first-index-of-max tie-break — identical in both engines), so a long
  doc whose strongest cluster of matches sits mid-document snippets that
  cluster, not its first lone hit (round-5; round-4 anchored at the
  first hit unconditionally);
- the window is tokens[max(1, anchor-w) .. anchor+w] (1-based slice);
- highlighting wraps every window token that equals ANY query term.

Cost: O(hits²) per row over QUERY-TERM occurrences only (not tokens),
evaluated on the ≤ k·|queries| result rows — driver-tiny, and still
row-parallel at any scale.

The reference has no text surface at all (vectors in, ids out,
/root/reference/src/core/node.rs:93-97); this is part of the fulltext
upgrade the north_star asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hora_spark.functions.tokenize import tokens_col


def _best_anchor_col(toks: Column, terms: list[str], window: int) -> Column:
    """1-based position of the earliest hit whose ±window neighborhood
    contains the most query-term hits; NULL when no term occurs."""
    term_arr = F.array(*[F.lit(t) for t in terms])
    # 1-based positions of ALL query-term occurrences
    hits = F.filter(
        F.transform(toks, lambda t, i: F.when(F.array_contains(term_arr, t),
                                              i + 1).otherwise(0)),
        lambda p: p > 0,
    )
    scores = F.transform(
        hits, lambda p: F.size(F.filter(hits, lambda q: F.abs(q - p) <= window))
    )
    # array_position = FIRST index of the max → earliest-hit tie-break
    best_idx = F.array_position(scores, F.array_max(scores))
    return F.when(F.size(hits) > 0,
                  F.element_at(hits, best_idx.cast("int")))


def snippet_col(text: Column, terms: list[str], window: int = 5,
                unicode: bool = False) -> Column:
    """Highlighted snippet string, or NULL when no term occurs."""
    toks = tokens_col(text, unicode=unicode)
    anchor = _best_anchor_col(toks, terms, window)
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


def snippets_col(text: Column, terms: list[str], window: int = 5,
                 n_fragments: int = 3, unicode: bool = False) -> Column:
    """UP TO n_fragments highlighted snippets (ES highlight
    number_of_fragments) as array<string>, or NULL when no term occurs.

    Anchor selection is pinned for reproducibility: hits rank by
    (window_score DESC, position ASC) — encoded as one sortable key so
    both engines order identically — and are taken GREEDILY, skipping
    any hit within 2·window of an already-selected anchor (fragments
    never overlap). Fragments are emitted in DOCUMENT ORDER (ES's
    default), each highlighted like snippet_col. Pure built-in Columns:
    the greedy pass is one F.aggregate over the ≤|hits| ranked keys —
    no Python, row-parallel at any scale."""
    if n_fragments < 1:
        raise ValueError("n_fragments must be >= 1")
    toks = tokens_col(text, unicode=unicode)
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = F.filter(
        F.transform(toks, lambda t, i: F.when(F.array_contains(term_arr, t),
                                              i + 1).otherwise(0)),
        lambda p: p > 0,
    )
    # sortable key: (window_score DESC, pos ASC) → score·BIG − pos DESC;
    # positions are array indices (≪ 2^31), scores ≤ |hits| — no overflow
    # in the int64 key for any realistic document
    big = F.lit(2_147_483_648).cast("long")
    keys = F.reverse(F.array_sort(F.transform(
        hits,
        lambda p: (F.size(F.filter(hits, lambda q: F.abs(q - p) <= window))
                   .cast("long") * big - p.cast("long")),
    )))
    # greedy non-overlapping selection of up to n_fragments anchors.
    # Recovering the position from the key: key = score·big − pos with
    # 1 ≤ pos < big ⇒ key mod big = big − pos ⇒ pos = big − (key mod big)
    anchors = F.aggregate(
        keys,
        F.expr("CAST(array() AS array<bigint>)"),
        lambda acc, kv: F.when(
            (F.size(acc) < n_fragments)
            & ~F.exists(acc, lambda a:
                        F.abs(a - (big - F.pmod(kv, big))) <= 2 * window),
            F.array_append(acc, big - F.pmod(kv, big))).otherwise(acc),
    )
    ordered = F.array_sort(anchors)  # document order

    def _frag(anchor: Column) -> Column:
        start = F.greatest(anchor - F.lit(window), F.lit(1)).cast("int")
        length = (anchor + F.lit(window) - start + F.lit(1)).cast("int")
        win = F.slice(toks, start, length)
        marked = F.transform(
            win,
            lambda t: F.when(F.array_contains(term_arr, t),
                             F.concat(F.lit("["), t, F.lit("]"))).otherwise(t),
        )
        return F.concat_ws(" ", marked)

    return F.when(F.size(hits) > 0, F.transform(ordered, _frag))


def with_snippets(df: DataFrame, query_terms: list[str], text_col: str = "text",
                  window: int = 5, unicode: bool = False,
                  out_col: str = "snippet", n_fragments: int = 1) -> DataFrame:
    """Attach a snippet column for the given query terms (typically the
    ≤ k·|queries| rows coming back from search_with_text — driver-tiny,
    but the expression is row-parallel and works at any scale).
    n_fragments > 1 switches to the multi-fragment form (array<string>
    of up to that many non-overlapping highlighted windows, document
    order — ES highlight number_of_fragments)."""
    col = (snippet_col(F.col(text_col), query_terms, window, unicode)
           if n_fragments == 1
           else snippets_col(F.col(text_col), query_terms, window,
                             n_fragments, unicode))
    return df.withColumn(out_col, col)


def snippet_sql(text_expr: str, terms: list[str], window: int = 5) -> str:
    """The DuckDB twin of snippet_col (ASCII tokenizer) — used by the
    driver oracle; kept adjacent so the two stay in lockstep."""
    toks = ("list_filter(string_split_regex(lower(coalesce(" + text_expr
            + ", '')), '[^a-z0-9]+'), x -> x <> '')")
    term_list = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    hits = (f"list_filter(list_transform(range(len({toks})), i -> i + 1), "
            f"p -> list_contains({term_list}, {toks}[p]))")
    scores = (f"list_transform({hits}, "
              f"p -> len(list_filter({hits}, q -> abs(q - p) <= {window})))")
    anchor = f"{hits}[list_position({scores}, list_max({scores}))]"
    start = f"greatest({anchor} - {window}, 1)"
    stop = f"{anchor} + {window}"
    return (
        f"CASE WHEN len({hits}) > 0 THEN "
        f"array_to_string(list_transform({toks}[{start}:{stop}], "
        f"t -> CASE WHEN list_contains({term_list}, t) "
        f"THEN '[' || t || ']' ELSE t END), ' ') END"
    )
