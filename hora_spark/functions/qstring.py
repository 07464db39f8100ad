"""Query-string mini-language → boolean-query spec (the Lucene classic
QueryParser subset the engine's clause model can host).

Capability analog: hora's `search(item, k)` takes a pre-built query vector
(/root/reference/src/core/ann_index.rs:74-97); a fulltext engine's "query
vector" is the parsed boolean query. This module is pure SYNTAX — it never
tokenizes (the index's pinned tokenizer mode is applied downstream by
search_topk, so the same string parses identically for ASCII and Unicode
indexes) and it runs once per query on the driver.

Grammar (flat boolean, whitespace-separated clauses):

  word            SHOULD clause (optional, scores if matched)
  +word           MUST clause (doc must contain every token of `word`)
  -word           MUST_NOT clause (docs containing any token are dropped)
  word^2.5        boost: the term's BM25 contribution × 2.5 (> 0);
                  composes with '+' ("+word^2" = required and boosted)
  "a b c"         exact-phrase clause (required, adjacency verified from
                  the positional index; scored bag-of-words like the
                  engine's phrase mode)
  "a b c"~3       proximity clause (required): every term within 3 tokens
                  of some shared anchor occurrence, order-free (Lucene
                  slop); "+\"...\"" is accepted (phrases are must clauses
                  already)
  pre* *ing t?ble word~1 /jo.n/
                  dictionary expansions (prefix / wildcard / fuzzy /
                  whole-term regex) — SHOULD clauses only; '+'/'-'/boost
                  cannot compose with an expansion (the clause identity
                  would be ambiguous over the expanded set)
  field:value     fielded FILTER clause (ES filter context) over the
                  index's IndexConfig.field_cols: required, scores 0.
                  Repeating a field ("lang:en lang:de") ORs its values;
                  distinct fields AND. '-field:value' excludes matching
                  docs; '+field:value' is accepted (filters are already
                  required). Boosting or expanding a filter is an error
                  (it never scores / the dictionary excludes field terms).

Not supported (documented scope, errors are loud): nested parentheses,
OR/AND keywords (bare words are OR'd; use '+' for AND), escaped quotes
inside phrases, and must_not phrases (exclusion is term-granular in the
engine).

minimum_should_match is a search-time setting, not query syntax — pass it
alongside (Engine.query_string(min_match=...)); with must/phrase clauses
present it counts SHOULD clauses only, the Lucene convention.
"""

from __future__ import annotations

import re

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"(?:~(\d+))?(\S*)')
_BOOST_RE = re.compile(r"^(?P<body>.+?)\^(?P<w>\d+(?:\.\d+)?)$")
_FUZZY_SUFFIX_RE = re.compile(r"^.+~[12]?$")


def parse_query_string(q: str) -> dict:
    """Parse a query string into a `searches` dict spec with any of
    {text, required, exclude, boosts, phrases, prefix} set. Raises
    ValueError on syntax the engine cannot honor (unbalanced quotes,
    must_not phrases, boosted/required expansions, boost ≤ 0, empty
    phrases, a query with no positive clause)."""
    if q.count('"') % 2:
        raise ValueError(f"unbalanced quotes in query string {q!r}")

    phrases: list[tuple[str, int | None, bool]] = []

    def _take_phrase(m: re.Match) -> str:
        sign, body, slop, junk = (m.group(1), m.group(2), m.group(3),
                                  m.group(4))
        if junk:
            # 'errors are loud': a phrase boost ('"a b"^2') or slop
            # residue ('"a b"~3x') previously leaked back into the word
            # stream and silently tokenized into a SHOULD term
            if junk.startswith("^"):
                raise ValueError(
                    f'phrase boost "{body}"{junk} is not supported '
                    "(boosts are term-granular: boost the phrase's terms "
                    "instead)")
            raise ValueError(
                f'trailing {junk!r} after phrase "{body}" in query string')
        if sign == "-":
            raise ValueError(
                f'must_not phrase -"{body}" is not supported (exclusion '
                "is term-granular; drop the quotes to exclude the terms)")
        if not body.strip():
            raise ValueError("empty phrase clause in query string")
        if slop is None:
            phrases.append((body, None, False))
        else:
            # Lucene slop is order-free proximity
            phrases.append((body, int(slop), True))
        return " "

    rest = _PHRASE_RE.sub(_take_phrase, q or "")
    if '"' in rest:
        raise ValueError(f"stray quote in query string {q!r}")

    should: list[str] = []
    required: list[str] = []
    exclude: list[str] = []
    boosts: dict[str, float] = {}
    fields: dict[str, list[str]] = {}
    fields_not: dict[str, list[str]] = {}
    any_expansion = False
    for w in rest.split():
        sign = ""
        if w[0] in "+-":
            sign, w = w[0], w[1:]
            if not w:
                raise ValueError(f"bare {sign!r} clause in query string")
        bm = _BOOST_RE.match(w)
        weight = None
        if bm:
            w, weight = bm.group("body"), float(bm.group("w"))
            if not weight > 0:
                raise ValueError(f"boost must be > 0 in {w!r}^{weight}")
        if ":" in w:
            f, _, v = w.partition(":")
            if not f or not v:
                raise ValueError(
                    f"malformed field clause {w!r} (want field:value)")
            if weight is not None:
                raise ValueError(
                    f"boosting field clause {w!r} is meaningless "
                    "(filters score 0)")
            if "*" in v or "?" in v or _FUZZY_SUFFIX_RE.match(v):
                raise ValueError(
                    f"field clause {w!r} cannot carry an expansion "
                    "(field terms are excluded from the dictionary)")
            (fields_not if sign == "-" else fields).setdefault(
                f, []).append(v)
            continue
        is_expansion = ("*" in w or "?" in w
                        or (len(w) > 2 and w.startswith("/")
                            and w.endswith("/"))
                        or bool(_FUZZY_SUFFIX_RE.match(w)))
        if is_expansion:
            if sign or weight is not None:
                raise ValueError(
                    f"expansion clause {w!r} cannot carry '+'/'-'/boost "
                    "(the clause identity over the expanded term set "
                    "would be ambiguous)")
            any_expansion = True
            should.append(w)
            continue
        if sign == "-":
            if weight is not None:
                raise ValueError(f"boosting an excluded term -{w!r} is "
                                 "meaningless")
            exclude.append(w)
            continue
        if sign == "+":
            required.append(w)
        else:
            should.append(w)
        if weight is not None:
            boosts[w] = weight

    if not (should or required or phrases):
        raise ValueError(
            f"query string {q!r} has no positive clause (pure-negative "
            "queries match nothing — the engine has no match-all scan)")

    spec: dict = {"text": " ".join(should)}
    if required:
        spec["required"] = required
    if exclude:
        spec["exclude"] = " ".join(exclude)
    if boosts:
        spec["boosts"] = boosts
    if phrases:
        spec["phrases"] = phrases
    if any_expansion:
        spec["prefix"] = True
    if fields:
        spec["fields"] = fields
    if fields_not:
        spec["fields_not"] = fields_not
    return spec
