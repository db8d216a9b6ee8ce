"""Training-data pipeline extras — the operations a 100 TB corpus
pipeline needs beyond the reference's index model (driver brief):
deduplication (exact / keyed / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + trained IVF +
distributed k-means), temporal as-of joins over event streams, broadcast dimension joins, text
analysis (language-ID, quality, token counting, fingerprinting), and
multimodal binary-column plumbing.

Each operator is a Ray Data pipeline over the driver's testdata tables
(`documents`, `embeddings`, `events`, `orders`/`customer`/`nation`);
SQL-expressible ones carry a DuckDB oracle
in ORACLE_SQLS (driver correctness gate), the rest are rows-only and
verified against pure-Python oracles in tests/.
"""

from __future__ import annotations

from ciff_ray.extras import (
    bloomjoin,
    chunking,
    cleaning,
    dedup,
    eventjoin,
    fuzzy,
    graph,
    multimodal,
    pagerank,
    relational,
    sampling,
    simsearch,
    sketch,
    textstats,
)

QUERIES = {
    **bloomjoin.QUERIES,
    **chunking.QUERIES,
    **eventjoin.QUERIES,
    **relational.QUERIES,
    **textstats.QUERIES,
    **dedup.QUERIES,
    **graph.QUERIES,
    **simsearch.QUERIES,
    **multimodal.QUERIES,
    **sampling.QUERIES,
    **fuzzy.QUERIES,
    **pagerank.QUERIES,
    **sketch.QUERIES,
    **cleaning.QUERIES,
}

ORACLE_SQLS = {
    **bloomjoin.ORACLE_SQLS,
    **chunking.ORACLE_SQLS,
    **eventjoin.ORACLE_SQLS,
    **relational.ORACLE_SQLS,
    **textstats.ORACLE_SQLS,
    **dedup.ORACLE_SQLS,
    **graph.ORACLE_SQLS,
    **simsearch.ORACLE_SQLS,
    **multimodal.ORACLE_SQLS,
    **sampling.ORACLE_SQLS,
    **fuzzy.ORACLE_SQLS,
    **pagerank.ORACLE_SQLS,
    **sketch.ORACLE_SQLS,
    **cleaning.ORACLE_SQLS,
}
