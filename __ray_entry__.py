"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ciff_ray) calls ray.init()/ray.shutdown().

Each queries() entry is a SURVEY.md §2 operator family expressed as a
Ray Data pipeline (ciff_ray.pipelines / ciff_ray extras); oracle_sql()
returns the DuckDB-equivalent SQL over the same testdata views.  The
canonical transcripts input is derived deterministically from
`documents` on BOTH sides (ciff_ray.synth.SQL_TRANSCRIPTS_CTE).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    derived transcripts, serve the fixed BM25 query set, return ranked
    results."""
    from ciff_ray import pipelines

    return pipelines.q_bm25_topk("/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 queries() entries in
# dict order.  The window is allocated deliberately each round so every
# entry eventually gets a hard driver-gate row.  Round-5 allocation, per
# the round-4 verdict ("keep rotating"): (1) the 20 entries that have
# NEVER had a driver row in any CORRECTNESS_r* file (the round-4 tail
# families: highlight/surprisal/percolate/LTR/context/aggs/trending/
# nextterm/reorder, the lm_jm + boolean-MSM + wildcard-suffix + regex +
# unordered-span + ranked-DSL variants, and the dense-serving
# collapsed/page2/hit-counts/scores-bulk four); (2) re-seat the flagship
# bm25_topk / bm25_scores pair once (last driver row r03); (3) every
# entry whose serving code is touched by round-5 changes (positions
# conjunction moved off-driver -> span/proximity/positional-phrase
# family; sharded default; tfidf nan fix; quantized range/tombstone
# coupling); (4) the r03-only singles, re-seated.  Everything displaced
# is green in CORRECTNESS_r03/r04 and still covered by
# tools/crosscheck.py (full 119-entry run).
_DRIVER_WINDOW_PRIORITY = [
    # -- (1) never driver-checked in r01-r04 ------------------------------
    "highlight_spans", "doc_surprisal", "percolate", "percolate_phrase",
    "ltr_features", "hit_context", "match_stats", "trending_terms",
    "suggest_next_term", "bm25_topk_reordered", "lm_jm", "boolean_or_msm",
    "wildcard_suffix", "term_regex", "span_unordered", "search_dsl_ranked",
    "bm25_topk_collapsed", "bm25_topk_page2", "bm25_hit_counts",
    "bm25_scores_bulk",
    # -- (2) flagship pair, re-seated -------------------------------------
    "bm25_topk", "bm25_scores",
    # -- (3) round-5 touched serving paths ---------------------------------
    "span_near", "proximity_pairs", "bm25_proximity",
    "phrase_match_positional", "bm25_topk_sharded", "tfidf_cosine",
    "bm25_topk_quantized",
    # -- (4) r03-only singles, re-seated -----------------------------------
    "bm25_topk_merged", "bm25_topk_compacted", "bm25_topk_filtered",
    "bm25_feedback", "bm25_boosted", "bm25_fuzzy", "bm25_facets",
    "bm25_snippets", "boolean_and", "phrase_match", "doc_top_tfidf",
    "hybrid_rrf", "conv_topk", "ranking_eval", "term_suggest",
    "more_like_this", "role_top_terms", "doclength_quantiles",
    "sessionize", "funnel", "cohort_retention",
    # ----------------------------------------------------------------------
    # Rotated out this round (all green in r04): the extras window family
    # (dedup_*, knn_*, ann_*, media_*, sketches, clean_corpus,
    # pack_sequences, source_mixture, fuzzy_terms, pagerank), the
    # round-4 scoring families (dfr_pl2, lm_dirichlet, bm25f_topk,
    # bm25_topk_tiered/stemmed/bulk, bm25_explain, date_histogram,
    # significant_terms, bm25_synonyms, bm25_recency, search_dsl,
    # boolean_or, boolean_and_not, wildcard_match, ranking_metrics,
    # bm25_scores_upserted, phrase_match_merged).
]


def queries() -> dict[str, Callable[[str], Any]]:
    from ciff_ray import pipelines as p
    from ciff_ray.booleanq import (
        q_boolean_and_not,
        q_boolean_or,
        q_boolean_or_msm,
        q_term_regex,
        q_wildcard_match,
        q_wildcard_suffix,
    )
    from ciff_ray.context import q_hit_context as _hit_context
    from ciff_ray.evaluation import q_ranking_eval as _ranking_eval
    from ciff_ray.evaluation import q_ranking_metrics as _ranking_metrics
    from ciff_ray.highlight import q_highlight_spans as _highlight_spans
    from ciff_ray.hybrid import q_hybrid_rrf as _hybrid_rrf
    from ciff_ray.positions import q_bm25_proximity as _bm25_proximity
    from ciff_ray.positions import q_phrase_match_merged as _phrase_merged
    from ciff_ray.positions import (
        q_phrase_match_positional as _positional_phrase,
    )
    from ciff_ray.ltr import q_ltr_features as _ltr_features
    from ciff_ray.nextterm import q_suggest_next_term as _suggest_next_term
    from ciff_ray.percolate import q_percolate as _percolate
    from ciff_ray.percolate import q_percolate_phrase as _percolate_phrase
    from ciff_ray.positions import q_proximity_pairs as _proximity
    from ciff_ray.quantized import q_bm25_topk_quantized as _bm25_quantized
    from ciff_ray.positions import q_span_near as _span_near
    from ciff_ray.positions import q_span_unordered as _span_unordered
    from ciff_ray.aggs import q_date_histogram as _date_histogram
    from ciff_ray.aggs import q_match_stats as _match_stats
    from ciff_ray.aggs import q_significant_terms as _significant_terms
    from ciff_ray.dfr import q_dfr_pl2 as _dfr_pl2
    from ciff_ray.lmdir import q_lm_dirichlet as _lm_dirichlet
    from ciff_ray.lmdir import q_lm_jm as _lm_jm
    from ciff_ray.recency import q_bm25_recency as _bm25_recency
    from ciff_ray.reorder import q_bm25_topk_reordered as _bm25_reordered
    from ciff_ray.searchdsl import q_search_dsl as _search_dsl
    from ciff_ray.searchdsl import q_search_dsl_ranked as _search_dsl_ranked
    from ciff_ray.surprisal import q_doc_surprisal as _doc_surprisal
    from ciff_ray.synonyms import q_bm25_synonyms as _bm25_synonyms
    from ciff_ray.tfidf import q_tfidf_cosine as _tfidf_cosine
    from ciff_ray.trending import q_trending_terms as _trending_terms

    entries: dict[str, Callable[[str], Any]] = {
        # inverted-index engine family (SURVEY.md §2; north_rule gate)
        "tokenize_tf": p.q_tokenize_tf,
        "postings_stats": p.q_postings_stats,
        "docmap": p.q_docmap,
        "collection_stats": p.q_collection_stats,
        "postings_lists": p.q_postings_lists,
        "conv_stats": p.q_conv_stats,
        "turn_window": p.q_turn_window,
        "bm25_scores": p.q_bm25_scores,
        "bm25_topk": p.q_bm25_topk,
        "bm25_topk_merged": p.q_bm25_topk_merged,
        "bm25_topk_sharded": p.q_bm25_topk_sharded,
        "bm25_topk_compacted": p.q_bm25_topk_compacted,
        "bm25_topk_pruned": p.q_bm25_topk_pruned,
        "bm25_topk_tiered": p.q_bm25_topk_tiered,
        "bm25_topk_bulk": p.q_bm25_topk_bulk,
        "bm25_topk_collapsed": p.q_bm25_topk_collapsed,
        "bm25_topk_page2": p.q_bm25_topk_page2,
        "bm25_explain": p.q_bm25_explain,
        "bm25_hit_counts": p.q_bm25_hit_counts,
        "bm25_scores_bulk": p.q_bm25_scores_bulk,
        "bm25_scores_upserted": p.q_bm25_scores_upserted,
        "bm25f_topk": p.q_bm25f_topk,
        "bm25_topk_filtered": p.q_bm25_topk_filtered,
        "bm25_feedback": p.q_bm25_feedback,
        "bm25_boosted": p.q_bm25_boosted,
        "bm25_fuzzy": p.q_bm25_fuzzy,
        "bm25_facets": p.q_bm25_facets,
        "bm25_topk_stemmed": p.q_bm25_topk_stemmed,
        "bm25_snippets": p.q_bm25_snippets,
        "boolean_and": p.q_boolean_and,
        "boolean_or": q_boolean_or,
        "boolean_or_msm": q_boolean_or_msm,
        "boolean_and_not": q_boolean_and_not,
        "wildcard_match": q_wildcard_match,
        "wildcard_suffix": q_wildcard_suffix,
        "term_regex": q_term_regex,
        "search_dsl": _search_dsl,
        "search_dsl_ranked": _search_dsl_ranked,
        "span_near": _span_near,
        "span_unordered": _span_unordered,
        "ranking_metrics": _ranking_metrics,
        "bm25_synonyms": _bm25_synonyms,
        "bm25_recency": _bm25_recency,
        "lm_dirichlet": _lm_dirichlet,
        "lm_jm": _lm_jm,
        "dfr_pl2": _dfr_pl2,
        "tfidf_cosine": _tfidf_cosine,
        "bm25_topk_quantized": _bm25_quantized,
        "doc_surprisal": _doc_surprisal,
        "percolate": _percolate,
        "ltr_features": _ltr_features,
        "hit_context": _hit_context,
        "match_stats": _match_stats,
        "percolate_phrase": _percolate_phrase,
        "trending_terms": _trending_terms,
        "suggest_next_term": _suggest_next_term,
        "bm25_topk_reordered": _bm25_reordered,
        "bm25_topk_reordered_bp": lambda sf: _bm25_reordered(sf, "bp"),
        "date_histogram": _date_histogram,
        "significant_terms": _significant_terms,
        "phrase_match": p.q_phrase_match,
        "phrase_match_positional": _positional_phrase,
        "phrase_match_merged": _phrase_merged,
        "proximity_pairs": _proximity,
        "bm25_proximity": _bm25_proximity,
        "highlight_spans": _highlight_spans,
        "doc_top_tfidf": p.q_doc_top_tfidf,
        "hybrid_rrf": _hybrid_rrf,
        "conv_topk": p.q_conv_topk,
        "ranking_eval": _ranking_eval,
        "term_suggest": p.q_term_suggest,
        "more_like_this": p.q_more_like_this,
        "role_top_terms": p.q_role_top_terms,
        "doclength_quantiles": p.q_doclength_quantiles,
    }
    try:
        from ciff_ray import extras

        entries.update(extras.QUERIES)
    except ImportError:
        pass
    ordered: dict[str, Callable[[str], Any]] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in entries:
            ordered[name] = entries.pop(name)
    ordered.update(entries)
    return ordered


def oracle_sql() -> dict[str, str]:
    from ciff_ray import pipelines as p

    sqls = dict(p.oracle_sqls())
    # merged index + merged positional store are docID-identical to the
    # monolithic pair by construction (byte-order split), so the merged
    # phrase entry shares the positional phrase oracle verbatim
    sqls["phrase_match_merged"] = sqls["phrase_match_positional"]
    # the signature-reordered index serves in the ORIGINAL id space and
    # is rank-and-score-identical by construction — same monolithic
    # BM25 oracle (the merged/sharded entries' device)
    sqls["bm25_topk_reordered"] = sqls["bm25_topk"]
    # ... and so is the BP (recursive-graph-bisection) order
    sqls["bm25_topk_reordered_bp"] = sqls["bm25_topk"]
    from ciff_ray.booleanq import (
        boolean_and_not_oracle_sql,
        boolean_or_msm_oracle_sql,
        boolean_or_oracle_sql,
        term_regex_oracle_sql,
        wildcard_match_oracle_sql,
        wildcard_suffix_oracle_sql,
    )
    from ciff_ray.evaluation import (
        ranking_eval_oracle_sql,
        ranking_metrics_oracle_sql,
    )
    from ciff_ray.hybrid import hybrid_oracle_sql
    from ciff_ray.positions import (
        span_near_oracle_sql,
        span_unordered_oracle_sql,
    )

    sqls["hybrid_rrf"] = hybrid_oracle_sql()
    sqls["ranking_eval"] = ranking_eval_oracle_sql()
    sqls["ranking_metrics"] = ranking_metrics_oracle_sql()
    sqls["boolean_or"] = boolean_or_oracle_sql()
    sqls["boolean_or_msm"] = boolean_or_msm_oracle_sql()
    sqls["boolean_and_not"] = boolean_and_not_oracle_sql()
    sqls["wildcard_match"] = wildcard_match_oracle_sql()
    sqls["wildcard_suffix"] = wildcard_suffix_oracle_sql()
    sqls["term_regex"] = term_regex_oracle_sql()
    from ciff_ray.searchdsl import (
        search_dsl_oracle_sql,
        search_dsl_ranked_oracle_sql,
    )

    sqls["search_dsl"] = search_dsl_oracle_sql()
    sqls["search_dsl_ranked"] = search_dsl_ranked_oracle_sql()
    from ciff_ray.highlight import highlight_spans_oracle_sql

    sqls["highlight_spans"] = highlight_spans_oracle_sql()
    sqls["span_near"] = span_near_oracle_sql()
    sqls["span_unordered"] = span_unordered_oracle_sql()
    from ciff_ray.recency import bm25_recency_oracle_sql
    from ciff_ray.synonyms import bm25_synonyms_oracle_sql

    sqls["bm25_synonyms"] = bm25_synonyms_oracle_sql()
    sqls["bm25_recency"] = bm25_recency_oracle_sql()
    from ciff_ray.lmdir import lm_dirichlet_oracle_sql, lm_jm_oracle_sql

    sqls["lm_dirichlet"] = lm_dirichlet_oracle_sql()
    sqls["lm_jm"] = lm_jm_oracle_sql()
    from ciff_ray.aggs import (
        date_histogram_oracle_sql,
        match_stats_oracle_sql,
        significant_terms_oracle_sql,
    )
    from ciff_ray.dfr import dfr_pl2_oracle_sql

    from ciff_ray.tfidf import tfidf_cosine_oracle_sql

    sqls["dfr_pl2"] = dfr_pl2_oracle_sql()
    from ciff_ray.quantized import bm25_topk_quantized_oracle_sql

    sqls["tfidf_cosine"] = tfidf_cosine_oracle_sql()
    from ciff_ray.surprisal import doc_surprisal_oracle_sql

    sqls["bm25_topk_quantized"] = bm25_topk_quantized_oracle_sql()
    from ciff_ray.percolate import (
        percolate_oracle_sql,
        percolate_phrase_oracle_sql,
    )

    sqls["doc_surprisal"] = doc_surprisal_oracle_sql()
    from ciff_ray.trending import trending_terms_oracle_sql

    sqls["percolate_phrase"] = percolate_phrase_oracle_sql()
    from ciff_ray.nextterm import suggest_next_term_oracle_sql

    sqls["trending_terms"] = trending_terms_oracle_sql()
    sqls["suggest_next_term"] = suggest_next_term_oracle_sql()
    from ciff_ray.ltr import ltr_features_oracle_sql

    sqls["percolate"] = percolate_oracle_sql()
    from ciff_ray.context import hit_context_oracle_sql

    sqls["ltr_features"] = ltr_features_oracle_sql()
    sqls["hit_context"] = hit_context_oracle_sql()
    sqls["date_histogram"] = date_histogram_oracle_sql()
    sqls["match_stats"] = match_stats_oracle_sql()
    sqls["significant_terms"] = significant_terms_oracle_sql()
    try:
        from ciff_ray import extras

        sqls.update(extras.ORACLE_SQLS)
    except ImportError:
        pass
    return sqls
