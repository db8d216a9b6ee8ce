"""Command-line entry points: ``python -m ciff_ray <command>``.

Mirrors the reference's three CLIs (`ciff2pisa` /root/reference/src/ciff2pisa.rs,
`pisa2ciff` src/pisa2ciff.rs, `jsonl2ciff` src/jsonl2ciff.rs) and adds the
Ray-native engine commands (build / query / import-ciff / export-ciff).

The CLI owns the Ray session (guarded init); the library never calls
ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_build(args) -> None:
    _ray_session()
    from ciff_ray.build import IndexBuilder

    b = (
        IndexBuilder()
        .output_dir(args.output)
        .partitions(args.partitions)
        .bm25(args.k1, args.b)
    )
    if args.jsonl:
        b.input_jsonl(args.input)
    else:
        b.input_parquet(args.input)
    if args.description:
        b.description(args.description)
    if args.analyzer:
        b.analyzer(args.analyzer)
    manifest = b.convert()
    print(json.dumps({"num_docs": manifest.num_docs,
                      "num_postings_lists": manifest.num_postings_lists,
                      "average_doclength": manifest.average_doclength,
                      "output": args.output}))


def cmd_query(args) -> None:
    from ciff_ray.query import LocalScorer, QueryEngine

    eng = QueryEngine(args.index)
    if args.model == "bm25":
        docs, scores = eng.topk(args.query, k=args.k, mode=args.mode)
    else:
        scorer = eng._local
        if args.model == "lmdir":
            from ciff_ray.lmdir import lm_score_all

            u, s = lm_score_all(scorer, args.query)
        elif args.model == "lmjm":
            from ciff_ray.lmdir import lm_jm_score_all

            u, s = lm_jm_score_all(scorer, args.query)
        elif args.model == "pl2":
            from ciff_ray.dfr import pl2_score_all

            u, s = pl2_score_all(scorer, args.query)
        else:  # tfidf
            if not args.norms:
                raise SystemExit("--model tfidf requires --norms <dir>")
            from ciff_ray.tfidf import DocnormStore, tfidf_score_all

            u, s = tfidf_score_all(
                scorer, DocnormStore(args.norms, scorer.N), args.query
            )
        docs, scores = LocalScorer._rank(u, s, args.k)
    titles = eng.collection_docids(docs)
    for rank, (d, s, t) in enumerate(zip(docs, scores, titles), 1):
        print(f"{rank}\t{d}\t{s:.6f}\t{t}")


def cmd_stats(args) -> None:
    """Index observability rollup (the `_cat/indices` analogue)."""
    _ray_session()
    from ciff_ray.report import index_report

    print(json.dumps(index_report(args.index)))


def cmd_ltr(args) -> None:
    """Five-family LTR feature vectors for a query workload over an
    index + doc-norms pair, to partitioned Parquet."""
    _ray_session()
    import ray.data

    from ciff_ray.ltr import _LTRFeatureActor

    with open(args.queries) as f:
        queries = [ln.strip() for ln in f if ln.strip()]
    import pyarrow as pa

    qs = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(queries)), type=pa.int64()),
                "query": pa.array(queries),
            }
        )
    )
    qs.repartition(4).map_batches(
        _LTRFeatureActor,
        fn_constructor_args=(args.index, args.norms, args.k),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).write_parquet(args.out)
    print(f"ltr features for {len(queries)} queries -> {args.out}")


def cmd_percolate(args) -> None:
    import ray.data

    from ciff_ray.percolate import percolate

    with open(args.queries) as f:
        registry = [ln.strip() for ln in f if ln.strip()]
    docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
    percolate(docs, registry).write_parquet(args.out)
    print(f"percolated {len(registry)} stored queries -> {args.out}")


def cmd_ciff2pisa(args) -> None:
    from ciff_ray.interop import CiffReader, CiffToPisa

    # the reference prints the CIFF header before converting
    # (/root/reference/src/lib.rs:497)
    print(CiffReader(args.input).header)
    b = CiffToPisa().input_path(args.input).output_paths(args.output)
    if args.skip_lexicons:
        b.skip_lexicons()
    b.convert()


def cmd_pisa2ciff(args) -> None:
    from ciff_ray.interop import PisaToCiff

    b = PisaToCiff().index_paths(args.input).output_path(args.output)
    if args.terms:
        b.terms_path(args.terms)
    if args.titles:
        b.titles_path(args.titles)
    if args.description:
        b.description(args.description)
    b.convert()


def cmd_jsonl2ciff(args) -> None:
    from ciff_ray.interop import jsonl_to_ciff

    h = jsonl_to_ciff(args.input, args.output, quantize=args.quantize)
    print(json.dumps({"num_docs": h.num_docs,
                      "num_postings_lists": h.num_postings_lists}))


def cmd_import_ciff(args) -> None:
    _ray_session()
    from ciff_ray.build import BuildParams
    from ciff_ray.interop.bridge import ciff_to_index

    m = ciff_to_index(args.input, args.output,
                      BuildParams(num_partitions=args.partitions))
    print(json.dumps({"num_docs": m.num_docs, "output": args.output}))


def cmd_merge(args) -> None:
    _ray_session()
    from ciff_ray.merge import merge_indexes

    m = merge_indexes(args.roots, args.output)
    print(json.dumps({"num_docs": m.num_docs,
                      "num_postings_lists": m.num_postings_lists,
                      "output": args.output}))


def cmd_delete(args) -> None:
    if args.convs:
        _ray_session()
        from ciff_ray.lifecycle import delete_convs

        n = delete_convs(args.index, args.doc_ids)
    else:
        from ciff_ray.lifecycle import delete_docs

        n = delete_docs(args.index, [int(x) for x in args.doc_ids])
    print(json.dumps({"total_tombstones": n}))


def cmd_upsert(args) -> None:
    _ray_session()
    import ray.data

    from ciff_ray.merge import upsert_convs

    ds = ray.data.read_parquet(
        args.input, columns=["conv_id", "turn_idx", "text"]
    )
    m = upsert_convs(args.base, ds, args.output)
    print(json.dumps({"num_docs": m.num_docs,
                      "num_postings_lists": m.num_postings_lists,
                      "output": args.output}))


def cmd_compact(args) -> None:
    _ray_session()
    from ciff_ray.lifecycle import compact_index

    m = compact_index(args.index, args.output)
    print(json.dumps({"num_docs": m.num_docs,
                      "num_postings_lists": m.num_postings_lists,
                      "output": args.output}))


def cmd_bulk(args) -> None:
    """Offline bulk retrieval: one query per line in the workload file,
    results (query_id, rank, doc_id[, score]) to partitioned Parquet —
    the resumable-output shape a labeling job consumes downstream."""
    _ray_session()
    from ciff_ray.bulk import bulk_scores, bulk_topk

    with open(args.workload) as f:
        queries = [line.strip() for line in f if line.strip()]
    if args.scores:
        ds = bulk_scores(args.index, queries)
    else:
        ds = bulk_topk(args.index, queries, k=args.k)
    ds.write_parquet(args.output)
    print(json.dumps({"queries": len(queries), "output": args.output}))


def cmd_fsck(args) -> None:
    _ray_session()
    import sys as _sys

    import pyarrow as pa

    from ciff_ray.fsck import (
        check_index,
        check_norms,
        check_positions,
        check_pruned,
    )

    t = check_index(args.index)
    if args.positions:
        t = pa.concat_tables(
            [t, check_positions(args.positions, index_dir=args.index)]
        )
    if args.norms:
        t = pa.concat_tables([t, check_norms(args.norms, args.index)])
    if args.mapping:
        from ciff_ray.fsck import check_mapping, check_mapping_pair
        from ciff_ray.layout import IndexPaths, Manifest

        n = Manifest.read(IndexPaths(args.index).manifest).num_docs
        inv = args.mapping + "-inv"
        if os.path.isdir(inv):
            # reorder writes the inverse store alongside; audit the
            # pair + the sampled new->old->new round-trip
            t = pa.concat_tables([t, check_mapping_pair(args.mapping, inv, n)])
        else:
            t = pa.concat_tables([t, check_mapping(args.mapping, n)])
    if args.full:
        t = pa.concat_tables([t, check_pruned(args.index, args.full)])
    for r in t.to_pylist():
        print(json.dumps(r))
    print(
        json.dumps(
            {"index": args.index, "findings": t.num_rows,
             "clean": t.num_rows == 0}
        )
    )
    if t.num_rows:
        _sys.exit(1)


def cmd_prune(args) -> None:
    _ray_session()
    from ciff_ray.pruned import prune_index

    m = prune_index(args.index, args.output, lam=args.top)
    print(json.dumps({"num_docs": m.num_docs, "top": args.top,
                      "output": args.output}))


def cmd_publish(args) -> None:
    from ciff_ray import catalog

    gen = catalog.publish(args.catalog, args.index)
    print(json.dumps({"generation": gen, "catalog": args.catalog}))


def cmd_current(args) -> None:
    from ciff_ray import catalog

    cur = catalog.current(args.catalog)
    if cur is None:
        print(json.dumps({"generation": None}))
    else:
        print(json.dumps({"generation": cur[0], "index_dir": cur[1]}))


def cmd_build_positions(args) -> None:
    _ray_session()
    import ray.data

    from ciff_ray.positions import build_positions

    docs = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    out = build_positions(docs, args.output)
    print(json.dumps({"output": out}))


def cmd_positions_merge(args) -> None:
    _ray_session()
    from ciff_ray.positions import merge_positions_for

    out = merge_positions_for(args.index_roots, args.pos_roots, args.output)
    print(json.dumps({"output": out}))


def cmd_positions_compact(args) -> None:
    _ray_session()
    from ciff_ray.positions import compact_positions

    out = compact_positions(args.positions, args.index, args.output)
    print(json.dumps({"output": out}))


def cmd_phrase(args) -> None:
    from ciff_ray.positions import PositionStore
    from ciff_ray.query import LocalScorer
    from ciff_ray.tokenizer import tokenize_column

    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.list_flatten(
        tokenize_column(pa.array([args.phrase], type=pa.string()))
    )
    terms = [t for t in toks.to_pylist() if t]
    scorer = LocalScorer(args.index)
    cand = None
    for t in sorted(set(terms)):
        docs, _ = scorer.postings(t)
        if cand is None or docs.size < cand.size:
            cand = docs  # rarest list bounds the position reads
        if docs.size == 0:
            cand = docs
            break
    if cand is None or cand.size == 0:
        return
    hits = PositionStore(args.positions).phrase_docs(terms, cand)
    for d, title in zip(hits, scorer.collection_docids(hits)):
        print(f"{d}\t{title}")


def cmd_search(args) -> None:
    from ciff_ray.query import LocalScorer
    from ciff_ray.searchdsl import search

    if args.k:
        docs, scores = search(args.index, args.positions, args.query, k=args.k)
        titles = LocalScorer(args.index).collection_docids(docs)
        for rank, (d, s, t) in enumerate(zip(docs, scores, titles), 1):
            print(f"{rank}\t{d}\t{s:.6f}\t{t}")
    else:
        docs = search(args.index, args.positions, args.query)
        for d, t in zip(docs, LocalScorer(args.index).collection_docids(docs)):
            print(f"{d}\t{t}")


def cmd_reorder(args) -> None:
    """Rebuild an index under a compression-friendly docID order
    (simhash | bp) from a documents.parquet dir; writes the index plus
    the doc-range-sharded new->old / old->new mapping stores serving
    uses to answer in the ORIGINAL id space."""
    _ray_session()
    from ciff_ray.reorder import build_reordered
    from ciff_ray.report import index_report

    idx, mapping = build_reordered(
        args.docs_dir, args.output, args.mapping, args.order
    )
    r = index_report(idx)
    print(
        json.dumps(
            {
                "index": idx,
                "mapping": mapping,
                "order": args.order,
                "postings": r["postings"],
                "doc_bytes": r["doc_bytes"],
            }
        )
    )


def cmd_export_ciff(args) -> None:
    if getattr(args, "quantize", False):
        # impact-quantized CIFF (M6 impacts in the tf slot — the
        # inverse of jsonl2ciff --quantize): two-pass flow, range scan
        # then quantized export
        from ciff_ray.layout import IndexPaths
        from ciff_ray.quantized import (
            compute_score_range,
            export_quantized_ciff,
        )

        # fail BEFORE the distributed range scan: the export refuses
        # tombstoned indexes, and that is knowable from one stat call
        if os.path.exists(IndexPaths(args.index).tombstones):
            raise SystemExit(
                "index has pending tombstones — run `compact` before "
                "exporting to CIFF"
            )
        lo, hi = compute_score_range(args.index)
        h = export_quantized_ciff(
            args.index, args.output, lo, hi, description=args.description
        )
        print(
            json.dumps(
                {
                    "num_docs": h.num_docs,
                    "num_postings_lists": h.num_postings_lists,
                    "quantize_range": [lo, hi],
                }
            )
        )
        return
    from ciff_ray.interop.bridge import index_to_ciff

    h = index_to_ciff(args.index, args.output, description=args.description)
    print(json.dumps({"num_docs": h.num_docs,
                      "num_postings_lists": h.num_postings_lists}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="ciff_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from transcripts parquet")
    b.add_argument("input")
    b.add_argument("output")
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--analyzer", default="",
                   help="term analyzer, e.g. porter (default: none)")
    b.add_argument("--jsonl", action="store_true",
                   help="input is JSONL transcript rows, not parquet")
    b.add_argument("--k1", type=float, default=0.9)
    b.add_argument("--b", type=float, default=0.4)
    b.add_argument("--description", default="")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k ranked query against an index")
    q.add_argument("index")
    q.add_argument("query")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["exact", "maxscore", "bmw", "auto"], default="exact")
    q.add_argument(
        "--model",
        choices=["bm25", "lmdir", "lmjm", "pl2", "tfidf"],
        default="bm25",
        help="scoring family (--mode applies to bm25 only)",
    )
    q.add_argument("--norms", help="doc-norms dir (required for --model tfidf)")
    q.set_defaults(fn=cmd_query)

    st = sub.add_parser(
        "stats", help="index observability rollup (slices/postings/bytes/codecs)"
    )
    st.add_argument("index")
    st.set_defaults(fn=cmd_stats)

    lt = sub.add_parser(
        "ltr",
        help="five-family LTR feature vectors over each query's BM25 pool",
    )
    lt.add_argument("index")
    lt.add_argument("norms", help="doc-norms dir (ciff_ray.tfidf.build_docnorms)")
    lt.add_argument("queries", help="text file, one query per line")
    lt.add_argument("out", help="output parquet dir")
    lt.add_argument("-k", type=int, default=10)
    lt.set_defaults(fn=cmd_ltr)

    pc = sub.add_parser(
        "percolate",
        help="reverse search: match docs parquet against stored queries",
    )
    pc.add_argument("queries", help="text file, one stored query per line")
    pc.add_argument("docs", help="parquet with (doc_id, text)")
    pc.add_argument("out", help="output parquet of (doc_id, query_id) matches")
    pc.set_defaults(fn=cmd_percolate)

    c2p = sub.add_parser("ciff2pisa", help="CIFF file -> PISA binary collection")
    c2p.add_argument("input")
    c2p.add_argument("output", help="output base path")
    c2p.add_argument("--skip-lexicons", action="store_true")
    c2p.set_defaults(fn=cmd_ciff2pisa)

    p2c = sub.add_parser("pisa2ciff", help="PISA binary collection -> CIFF file")
    p2c.add_argument("input", help="index base path")
    p2c.add_argument("output")
    p2c.add_argument("--terms")
    p2c.add_argument("--titles")
    p2c.add_argument("--description")
    p2c.set_defaults(fn=cmd_pisa2ciff)

    j2c = sub.add_parser("jsonl2ciff", help="JSONL impact vectors -> CIFF file")
    j2c.add_argument("input")
    j2c.add_argument("output")
    j2c.add_argument("--quantize", action="store_true")
    j2c.set_defaults(fn=cmd_jsonl2ciff)

    imp = sub.add_parser("import-ciff", help="CIFF file -> ciff_ray index dir")
    imp.add_argument("input")
    imp.add_argument("output")
    imp.add_argument("--partitions", type=int, default=8)
    imp.set_defaults(fn=cmd_import_ciff)

    ro = sub.add_parser(
        "reorder",
        help="rebuild an index under a compression-friendly docID order "
             "(simhash | bp) with original-id serving parity",
    )
    ro.add_argument("docs_dir", help="dir containing documents.parquet")
    ro.add_argument("output", help="reordered index dir")
    ro.add_argument("mapping", help="new->old mapping store dir "
                                    "(inverse written at <mapping>-inv)")
    ro.add_argument("--order", choices=["simhash", "bp"], default="simhash")
    ro.set_defaults(fn=cmd_reorder)

    exp = sub.add_parser("export-ciff", help="ciff_ray index dir -> CIFF file")
    exp.add_argument("index")
    exp.add_argument("output")
    exp.add_argument("--description")
    exp.add_argument(
        "--quantize", action="store_true",
        help="write M6-quantized impacts in the tf slot (two-pass: "
             "distributed range scan, then export)",
    )
    exp.set_defaults(fn=cmd_export_ciff)

    mg = sub.add_parser("merge", help="fold built indexes into one (incremental ingest)")
    mg.add_argument("roots", nargs="+", help="source index dirs (>= 2)")
    mg.add_argument("output")
    mg.set_defaults(fn=cmd_merge)

    dl = sub.add_parser("delete", help="tombstone docIDs in an index")
    dl.add_argument("index")
    dl.add_argument("doc_ids", nargs="+", help="docIDs to tombstone")
    dl.add_argument(
        "--convs",
        action="store_true",
        help="arguments are conv_ids: tombstone every turn of each",
    )
    dl.set_defaults(fn=cmd_delete)

    up = sub.add_parser(
        "upsert",
        help="replace whole conversations: tombstone old turns in BASE, "
        "ingest the new rows, merge into OUTPUT (compact to fold stats)",
    )
    up.add_argument("base", help="existing index dir (tombstones are written here)")
    up.add_argument("input", help="parquet of replacement transcripts")
    up.add_argument("output")
    up.set_defaults(fn=cmd_upsert)

    bp = sub.add_parser(
        "build-positions",
        help="build the positional store from transcripts parquet",
    )
    bp.add_argument("input")
    bp.add_argument("output")
    bp.set_defaults(fn=cmd_build_positions)

    pm = sub.add_parser(
        "positions-merge",
        help="fold positional stores to match a merge_indexes fold",
    )
    pm.add_argument(
        "--index-roots", nargs="+", required=True,
        help="the index roots passed to merge (doc_base source)",
    )
    pm.add_argument(
        "--pos-roots", nargs="+", required=True,
        help="each root's positional store, same order",
    )
    # flag, not positional: a positional after nargs="+" options is
    # ambiguous to argparse
    pm.add_argument("-o", "--output", required=True)
    pm.set_defaults(fn=cmd_positions_merge)

    pcp = sub.add_parser(
        "positions-compact",
        help="drop an index's tombstoned docs from its positional store",
    )
    pcp.add_argument("positions", help="positional store to rewrite")
    pcp.add_argument(
        "index", help="SOURCE index dir (the one carrying tombstones)"
    )
    pcp.add_argument("output")
    pcp.set_defaults(fn=cmd_positions_compact)

    ph = sub.add_parser(
        "phrase", help="index-only phrase match (needs a positional store)"
    )
    ph.add_argument("index")
    ph.add_argument("positions")
    ph.add_argument("phrase")
    ph.set_defaults(fn=cmd_phrase)

    se = sub.add_parser(
        "search",
        help="boolean search DSL (AND/OR/NOT, \"phrase\", role:, wild*, "
        "fuzzy~); -k adds BM25 ranking over the positive clauses",
    )
    se.add_argument("index")
    se.add_argument("positions")
    se.add_argument("query")
    se.add_argument("-k", type=int, default=0)
    se.set_defaults(fn=cmd_search)

    cp = sub.add_parser("compact", help="rewrite an index without its tombstoned docs")
    cp.add_argument("index")
    cp.add_argument("output")
    cp.set_defaults(fn=cmd_compact)

    pr = sub.add_parser("prune", help="top-lambda static pruning into a new index dir")
    pr.add_argument("index")
    pr.add_argument("output")
    pr.add_argument("--top", type=int, default=64)
    pr.set_defaults(fn=cmd_prune)

    bk = sub.add_parser(
        "bulk", help="offline bulk retrieval: a query-workload file -> parquet"
    )
    bk.add_argument("index")
    bk.add_argument("workload", help="text file, one query per line")
    bk.add_argument("output", help="output parquet directory")
    bk.add_argument("-k", type=int, default=10)
    bk.add_argument(
        "--scores", action="store_true",
        help="emit EVERY matching (query, doc, score) instead of top-k",
    )
    bk.set_defaults(fn=cmd_bulk)

    fs = sub.add_parser("fsck", help="distributed index integrity check")
    fs.add_argument("index")
    fs.add_argument(
        "--positions", default="",
        help="also validate this positional store against the index",
    )
    fs.add_argument(
        "--norms", default="",
        help="also validate this doc-norms store against the index",
    )
    fs.add_argument(
        "--mapping", default="",
        help="also validate this reorder new->old mapping store "
             "(permutation audit against the index's num_docs)",
    )
    fs.add_argument(
        "--full", default="",
        help="treat <index> as a PRUNED index and audit its tau bounds "
             "against this full source index",
    )
    fs.set_defaults(fn=cmd_fsck)

    pub = sub.add_parser("publish", help="register an index as the catalog's next generation")
    pub.add_argument("catalog")
    pub.add_argument("index")
    pub.set_defaults(fn=cmd_publish)

    curp = sub.add_parser("current", help="show the catalog's CURRENT generation")
    curp.add_argument("catalog")
    curp.set_defaults(fn=cmd_current)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
