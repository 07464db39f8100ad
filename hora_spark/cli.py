"""spark-submit entry point (north_star: "runs via spark-submit --py-files
on multi-executor clusters").

Package and submit:

    cd repo && zip -r hora_spark.zip hora_spark
    spark-submit --py-files hora_spark.zip -m hora_spark.cli ...   # or:
    spark-submit --py-files hora_spark.zip cli.py build \
        --input s3://bucket/transcripts --index s3://bucket/idx --waves 8
    spark-submit ... cli.py search --index s3://bucket/idx -q "error bash" -k 10
    spark-submit ... cli.py datagen --out /tmp/tx --convs 100000

The master/deploy-mode/executors come from spark-submit; get_spark only
forces local[] when no master was provided (HORA_SPARK_MASTER overrides).

Non-ASCII queries (the --unicode tokenizer mode): run spark-submit under a
UTF-8 locale, e.g. `LANG=C.UTF-8 spark-submit ...` — under the POSIX
default the JVM launcher decodes argv as ASCII and replaces CJK/Cyrillic
bytes with '?', losing them before Python ever starts (the CLI warns when
a query looks mangled that way).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hora_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build/resume the index over a transcripts table")
    b.add_argument("--input", required=True, help="parquet path or table of transcripts")
    b.add_argument("--index", required=True, help="index root (snapshot store)")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default=None, help="existing id column; omit to assign")
    b.add_argument("--order-cols", default="conv_id,turn_idx")
    b.add_argument("--waves", type=int, default=1)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--build-id", default="build-0")
    b.add_argument("--no-store-dl", action="store_true",
                   help="space-lean layout: no per-posting dl blocks "
                        "(~25%% smaller index; queries read the norms "
                        "sidecar instead — identical scores)")
    b.add_argument("--unicode", action="store_true",
                   help="tokenize Unicode letter/digit runs instead of "
                        "the ASCII [a-z0-9]+ default — CJK/Cyrillic/"
                        "Arabic text becomes searchable; queries follow "
                        "the index's recorded mode automatically")
    b.add_argument("--store-positions", action="store_true",
                   help="pack within-doc token positions per posting "
                        "(enables search --mode phrase; ~1-2 bytes per "
                        "token occurrence)")
    b.add_argument("--field-cols", default=None, metavar="COL,COL",
                   help="fielded-filter columns: each column's value is "
                        "tokenized and stored as '<field>:<token>' "
                        "postings (enables search --field / "
                        "--not-field and 'field:value' query-string "
                        "clauses)")

    s = sub.add_parser("search", help="top-k BM25 search")
    s.add_argument("--index", required=True)
    s.add_argument("-q", "--query", action="append", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--no-prune", action="store_true")
    s.add_argument("--filter", default=None,
                   help="parquet path whose first column is the ALLOWED "
                        "doc ids (filtered search: exact top-k among "
                        "them, scores unchanged)")
    s.add_argument("--mode", default="any",
                   choices=["any", "all", "phrase", "near", "near_unordered"],
                   help="'all' = conjunctive (every query term); 'phrase' "
                        "= exact adjacency; 'near' = every term within "
                        "--near-window tokens of the first; "
                        "'near_unordered' = within the window of ANY "
                        "term's occurrence, order-free (positional modes "
                        "need an index built with --store-positions)")
    s.add_argument("--near-window", type=int, default=5)
    s.add_argument("--not", dest="exclude", default=None, metavar="TERMS",
                   help="NOT terms (must_not): docs containing any of "
                        "these tokens are excluded; survivors' scores "
                        "unchanged")
    s.add_argument("--min-match", type=int, default=0,
                   help="minimum_should_match: keep only docs matching "
                        "at least this many distinct query terms "
                        "(mode=any)")
    s.add_argument("--prefix", action="store_true",
                   help="parse dictionary-expansion syntax: trailing-'*' "
                        "prefix queries (tok* matches every index term "
                        "starting with tok), trailing-'~' fuzzy "
                        "queries (tok~ / tok~2 match terms within edit "
                        "distance 1 / 2), and '*'/'?' wildcards anywhere "
                        "else (*ing, t?ble — leading/infix included), "
                        "each expansion scored with its own idf")
    s.add_argument("--boost", action="append", default=None,
                   metavar="TERM=W",
                   help="per-term boost (repeatable): multiply TERM's "
                        "BM25 contribution by W > 0 (Lucene's term^W); "
                        "applies to every -q in the invocation")
    s.add_argument("--synonym", action="append", default=None,
                   metavar="TERM=ALT[,ALT...]",
                   help="query-time synonym (repeatable): query tokens "
                        "equal to TERM also match the ALTs, each scored "
                        "with its own idf; non-matching TERMs are "
                        "ignored (pass the whole table)")
    s.add_argument("--query-string", action="store_true",
                   help="parse each -q as a Lucene-style query string: "
                        "'+must' terms, '-not' terms, '\"exact phrase\"' "
                        "and '\"loose terms\"~N' proximity clauses "
                        "(positional index required), 'term^W' boosts, "
                        "and prefix/wildcard/fuzzy expansions — all in "
                        "one boolean query per -q; --min-match then "
                        "counts the should clauses only")
    s.add_argument("--field", action="append", default=None,
                   metavar="FIELD=V[,V]",
                   help="index-resident fielded filter (repeatable): only "
                        "docs whose FIELD contains one of the values "
                        "(index must be built with --field-cols); "
                        "repeated values OR, distinct fields AND")
    s.add_argument("--not-field", action="append", default=None,
                   metavar="FIELD=V[,V]",
                   help="negative fielded filter (repeatable): exclude "
                        "docs whose FIELD contains any of the values")
    s.add_argument("--score-mode", default="sum", choices=["sum", "dismax"],
                   help="dis_max: score = best clause + tie-breaker*rest")
    s.add_argument("--tie-breaker", type=float, default=0.0)
    s.add_argument("--negative", default=None, metavar="TERMS",
                   help="boosting query: docs containing any of these "
                        "tokens are demoted (score x --negative-boost), "
                        "not excluded")
    s.add_argument("--negative-boost", type=float, default=1.0)
    s.add_argument("--collapse-by", default=None, metavar="PARQUET:COLUMN",
                   help="field collapsing: top-k keeping at most "
                        "--per-group docs per value of the named docs-"
                        "table column")
    s.add_argument("--per-group", type=int, default=1)
    s.add_argument("--after", default=None, metavar="SCORE,DOC_ID",
                   help="deep-paging cursor (search_after): pass the "
                        "score,doc_id of the previous page's LAST row to "
                        "get the next k results at page-1 cost (applies "
                        "to every -q in the invocation)")
    s.add_argument("--facet-by", default=None, metavar="PARQUET:COLUMN",
                   help="instead of top-k rows, print facet counts over "
                        "ALL matching docs, grouped by COLUMN of the "
                        "docs table at PARQUET (first column = doc id)")
    s.add_argument("--facet-metric", action="append", default=None,
                   metavar="COL=AGG[,AGG...]",
                   help="with --facet-by: add per-bucket stats of a "
                        "numeric docs column (aggs: avg,min,max,sum; "
                        "COL 'score' = the match's BM25 score)")

    ml = sub.add_parser("mlt", help="more-like-this: find docs similar "
                                    "to a source text or doc")
    ml.add_argument("--index", required=True)
    g_src = ml.add_mutually_exclusive_group(required=True)
    g_src.add_argument("--text", help="source text to find similar docs for")
    g_src.add_argument("--doc-id", type=int,
                       help="source doc id in --input (excluded from "
                            "the result)")
    ml.add_argument("--input", default=None,
                    help="docs parquet (needed with --doc-id; first use "
                         "of its id/text columns)")
    ml.add_argument("--id-col", default="doc_id")
    ml.add_argument("--text-col", default="text")
    ml.add_argument("-k", type=int, default=10)
    ml.add_argument("--max-terms", type=int, default=10,
                    help="how many top tf*idf terms of the source form "
                         "the query")

    ex = sub.add_parser("explain", help="score breakdown (Lucene Explanation "
                                        "analog): per-(doc, term) BM25 "
                                        "components for a query")
    ex.add_argument("--index", required=True)
    ex.add_argument("-q", "--query", required=True)
    ex.add_argument("--ids", default=None,
                    help="comma-separated doc ids to explain; omit to "
                         "explain the query's own top-k")
    ex.add_argument("-k", type=int, default=10,
                    help="top-k to explain when --ids is omitted")

    rs = sub.add_parser("rescore", help="two-pass proximity rescoring: "
                                        "top-window by BM25, re-ranked by "
                                        "qw*bm25 + rw*proximity score")
    rs.add_argument("--index", required=True)
    rs.add_argument("-q", "--query", required=True)
    rs.add_argument("-k", type=int, default=10)
    rs.add_argument("--window", type=int, default=100)
    rs.add_argument("--rescore-mode", default="phrase",
                    choices=["phrase", "near", "near_unordered"])
    rs.add_argument("--near-window", type=int, default=5)
    rs.add_argument("--query-weight", type=float, default=1.0)
    rs.add_argument("--rescore-weight", type=float, default=1.0)

    sg = sub.add_parser("suggest", help="spell suggestion: closest "
                                        "dictionary terms per query token "
                                        "(distance, then df)")
    sg.add_argument("--index", required=True)
    sg.add_argument("-q", "--query", required=True)
    sg.add_argument("-n", type=int, default=3)
    sg.add_argument("--max-distance", type=int, default=2, choices=[1, 2])
    sg.add_argument("--mode", default="missing",
                    choices=["missing", "popular", "always"],
                    help="'missing' = only tokens absent from the "
                         "dictionary; 'popular' = only corrections with "
                         "higher df; 'always' = rank for every token")

    rt = sub.add_parser("route", help="reverse search: standing queries "
                                      "score the input docs with the "
                                      "index's frozen stats")
    rt.add_argument("--index", required=True)
    rt.add_argument("--input", required=True, help="parquet of docs to route")
    rt.add_argument("-q", "--query", action="append", required=True)
    rt.add_argument("--min-score", type=float, default=0.5)
    rt.add_argument("--id-cols", default="doc_id",
                    help="comma-separated id columns of the input")

    a = sub.add_parser("append", help="incrementally index new rows")
    a.add_argument("--input", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--batch-id", default="delta-cli")

    c = sub.add_parser("compact", help="merge segment deltas (layout only; stats frozen)")
    c.add_argument("--index", required=True)

    d = sub.add_parser("delete", help="tombstone doc ids (removed from every search)")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", required=True, help="comma-separated doc ids")

    rb = sub.add_parser("rebuild", help="compact + refresh corpus stats (full rebuild analog)")
    rb.add_argument("--index", required=True)
    rb.add_argument("--build-id", default="rebuild-cli")

    x = sub.add_parser("expire", help="expire old snapshots and GC unreferenced data dirs")
    x.add_argument("--index", required=True)
    x.add_argument("--keep-last", type=int, default=2)

    g = sub.add_parser("datagen", help="deterministic synthetic transcripts")
    g.add_argument("--out", required=True)
    g.add_argument("--convs", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)

    i = sub.add_parser("info", help="lineage / metrics table")
    i.add_argument("--index", required=True)

    args = p.parse_args(argv)

    from hora_spark.engine import Engine
    from hora_spark.session import get_spark

    spark = get_spark(f"hora_spark_{args.cmd}")

    if args.cmd == "build":
        import dataclasses

        from hora_spark.config import EngineConfig
        cfg = EngineConfig()
        if args.no_store_dl:
            cfg = dataclasses.replace(
                cfg, index=dataclasses.replace(cfg.index, store_dl=False))
        if args.unicode:
            cfg = dataclasses.replace(
                cfg, index=dataclasses.replace(cfg.index, unicode=True))
        if args.store_positions:
            cfg = dataclasses.replace(
                cfg, index=dataclasses.replace(cfg.index, store_positions=True))
        if args.field_cols:
            cfg = dataclasses.replace(
                cfg, index=dataclasses.replace(
                    cfg.index, field_cols=tuple(
                        c for c in args.field_cols.split(",") if c)))
        eng = Engine(spark, args.index, cfg)
        out = eng.build(
            spark.read.parquet(args.input),
            text_col=args.text_col,
            id_col=args.id_col,
            order_cols=args.order_cols.split(","),
            waves=args.waves,
            resume=args.resume,
            build_id=args.build_id,
        )
        print(json.dumps(out))
    elif args.cmd == "search":
        # '?' is punctuation in both tokenizer modes (never a token), so a
        # query of only ?s is always the JVM-launcher locale mangling
        if any(q.strip() and set(q.strip()) <= {"?", " "} for q in args.query):
            print("WARNING: query looks locale-mangled (all '?'); run "
                  "spark-submit under a UTF-8 locale, e.g. LANG=C.UTF-8, "
                  "so non-ASCII argv survives the JVM launcher",
                  file=sys.stderr)
        eng = Engine(spark, args.index)
        fdf = spark.read.parquet(args.filter) if args.filter else None
        if args.facet_by:
            path, _, col = args.facet_by.rpartition(":")
            docs = spark.read.parquet(path)
            metrics = None
            if args.facet_metric:
                metrics = {}
                for spec in args.facet_metric:
                    c, _, fns = spec.partition("=")
                    metrics[c] = [a for a in fns.split(",") if a]
            res = eng.facets(args.query, docs, col, id_col=docs.columns[0],
                             metrics=metrics,
                             filter_df=fdf, mode=args.mode,
                             near_window=args.near_window,
                             exclude=args.exclude, min_match=args.min_match,
                             expand_prefixes=args.prefix)
            stat_cols = [c for c in res.columns
                         if c not in ("query_id", "facet")]
            for r in res.orderBy("query_id", "facet").collect():
                print(json.dumps({"query": args.query[r["query_id"]],
                                  "facet": r["facet"],
                                  **{c: r[c] for c in stat_cols}}))
        else:
            after = None
            if args.after:
                s_str, _, d_str = args.after.partition(",")
                after = (float(s_str), int(d_str))
            boosts = None
            if args.boost:
                boosts = {}
                for spec in args.boost:
                    t, _, w = spec.partition("=")
                    boosts[t] = float(w)
            synonyms = None
            if args.synonym:
                synonyms = {}
                for spec in args.synonym:
                    t, _, alts = spec.partition("=")
                    synonyms[t] = [a for a in alts.split(",") if a]

            def _parse_fields(specs_arg):
                if not specs_arg:
                    return None
                out = {}
                for spec in specs_arg:
                    f, _, vs = spec.partition("=")
                    out.setdefault(f, []).extend(
                        v for v in vs.split(",") if v)
                return out

            fields = _parse_fields(args.field)
            fields_not = _parse_fields(args.not_field)
            if args.collapse_by:
                path, _, col = args.collapse_by.rpartition(":")
                docs = spark.read.parquet(path)
                res = eng.collapse(
                    args.query, docs, col, k=args.k,
                    per_group=args.per_group, id_col=docs.columns[0],
                    filter_df=fdf, mode=args.mode,
                    near_window=args.near_window, exclude=args.exclude,
                    min_match=args.min_match, expand_prefixes=args.prefix,
                    fields=fields, fields_not=fields_not)
                for r in res.collect():
                    print(json.dumps({"query": args.query[r["query_id"]],
                                      "doc_id": r["doc_id"],
                                      "score": r["score"], col: r[col]}))
                return 0
            if args.query_string:
                from hora_spark.functions.qstring import parse_query_string

                specs = [parse_query_string(q) for q in args.query]
                if args.min_match:
                    for sp in specs:
                        sp["min_match"] = args.min_match
                res = eng.searches(specs, k=args.k,
                                   prune=not args.no_prune,
                                   filter_df=fdf, after=after)
            else:
                res = eng.searches(args.query, k=args.k,
                                   prune=not args.no_prune,
                                   filter_df=fdf, mode=args.mode,
                                   near_window=args.near_window,
                                   exclude=args.exclude,
                                   min_match=args.min_match,
                                   expand_prefixes=args.prefix,
                                   after=after, boosts=boosts,
                                   synonyms=synonyms,
                                   score_mode=args.score_mode,
                                   tie_breaker=args.tie_breaker,
                                   fields=fields, fields_not=fields_not,
                                   negative=args.negative,
                                   negative_boost=args.negative_boost)
            for r in res.collect():
                print(json.dumps({"query": args.query[r["query_id"]],
                                  "doc_id": r["doc_id"], "score": r["score"]}))
    elif args.cmd == "mlt":
        from pyspark.sql import functions as F

        eng = Engine(spark, args.index)
        if args.doc_id is not None:
            if not args.input:
                p.error("--doc-id requires --input")
            docs = spark.read.parquet(args.input)
            row = (docs.filter(F.col(args.id_col) == args.doc_id)
                   .select(args.text_col).limit(1).collect())
            if not row:
                print(f"ERROR: doc_id {args.doc_id} not found in "
                      f"{args.input}", file=sys.stderr)
                return 1
            res = eng.more_like_this(row[0][0], k=args.k,
                                     max_terms=args.max_terms,
                                     source_doc_id=args.doc_id)
        else:
            res = eng.more_like_this(args.text, k=args.k,
                                     max_terms=args.max_terms)
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    elif args.cmd == "explain":
        eng = Engine(spark, args.index)
        ids = ([int(x) for x in args.ids.split(",") if x.strip()]
               if args.ids else None)
        res = eng.explain(args.query, doc_ids=ids, k=args.k)
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"], "term": r["term"],
                              "tf": r["tf"], "dl": r["dl"], "idf": r["idf"],
                              "contrib": r["contrib"], "score": r["score"]}))
    elif args.cmd == "rescore":
        eng = Engine(spark, args.index)
        res = eng.rescore(args.query, k=args.k, window_size=args.window,
                          rescore_mode=args.rescore_mode,
                          near_window=args.near_window,
                          query_weight=args.query_weight,
                          rescore_weight=args.rescore_weight)
        for r in res.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"],
                              "base_score": r["base_score"],
                              "rescore_score": r["rescore_score"]}))
    elif args.cmd == "suggest":
        eng = Engine(spark, args.index)
        res = eng.suggest(args.query, n=args.n,
                          max_distance=args.max_distance, mode=args.mode)
        for r in res.collect():
            print(json.dumps({"input": r["input"],
                              "suggestion": r["suggestion"],
                              "distance": r["distance"], "df": r["df"],
                              "rank": r["rnk"]}))
    elif args.cmd == "route":
        eng = Engine(spark, args.index)
        ids = args.id_cols.split(",")
        out = eng.route(spark.read.parquet(args.input), args.query,
                        min_score=args.min_score, id_cols=ids)
        for r in out.collect():
            print(json.dumps({**{c: r[c] for c in ids},
                              "query": args.query[r["query_id"]],
                              "score": r["score"]}))
    elif args.cmd == "append":
        from hora_spark.streaming.incremental import append_build
        eng = Engine(spark, args.index)
        out = append_build(spark, eng.store, spark.read.parquet(args.input),
                           batch_id=args.batch_id)
        print(json.dumps(out))
    elif args.cmd == "compact":
        from hora_spark.streaming.incremental import merge_segments
        eng = Engine(spark, args.index)
        print(json.dumps({"version": merge_segments(spark, eng.store)}))
    elif args.cmd == "delete":
        eng = Engine(spark, args.index)
        print(json.dumps(eng.delete([int(x) for x in args.ids.split(",") if x.strip()])))
    elif args.cmd == "rebuild":
        eng = Engine(spark, args.index)
        print(json.dumps(eng.rebuild(build_id=args.build_id)))
    elif args.cmd == "expire":
        eng = Engine(spark, args.index)
        print(json.dumps(eng.store.expire_snapshots(keep_last=args.keep_last)))
    elif args.cmd == "datagen":
        from hora_spark.datagen import write_transcripts
        write_transcripts(spark, args.out, args.convs, seed=args.seed)
        print(json.dumps({"out": args.out, "convs": args.convs}))
    elif args.cmd == "info":
        Engine(spark, args.index).idx_info().show(100, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
