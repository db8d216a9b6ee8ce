"""ciff_ray — a Ray-Data-native inverted-index builder + BM25 query engine.

Reimplements, from scratch and Ray-Data-first, the index model and
statistics semantics of the CIFF reference (pisa-engine/ciff,
/root/reference): term-sorted posting lists of (docID, tf) with
delta + varint (Elias-gamma fallback) compression, per-document length
records, and CIFF-Header collection statistics — served as rank-identical
top-k BM25 over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts).

Nothing here is a port: the reference is a single-threaded file-cursor
format library (see SURVEY.md); this engine expresses every stage as a
`ray.data.Dataset` transform (`map_batches` over zero-copy Arrow,
`groupby` shuffles for the wide steps) and an actor pool for query
serving.

Layout of an index directory (the Parquet-era analogue of the CIFF
file / PISA binary collection, SURVEY.md §1.4):

    <index>/manifest.json        collection stats (CIFF Header analogue)
    <index>/lineage.jsonl        per-partition build lineage + metrics
    <index>/segments/part-*.parquet   packed posting slices, term-sorted
    <index>/term_dict.parquet    term -> (df, cf, slice locations)
    <index>/docmap/*.parquet     (doc_id, collection_docid, doclength)
"""

from ciff_ray.schemas import TRANSCRIPTS_SCHEMA, DOCMAP_SCHEMA, POSTINGS_SCHEMA
from ciff_ray.build import IndexBuilder, build_index
from ciff_ray.query import QueryEngine, BM25Params, ServingPool
from ciff_ray.merge import ingest, merge_indexes
from ciff_ray.lifecycle import compact_index, delete_docs
from ciff_ray.sharded import ShardedEngine, ShardedServingPool
from ciff_ray.positions import PositionStore, build_positions
from ciff_ray.oracle import OracleIndex

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "DOCMAP_SCHEMA",
    "POSTINGS_SCHEMA",
    "IndexBuilder",
    "build_index",
    "merge_indexes",
    "ingest",
    "delete_docs",
    "compact_index",
    "ShardedEngine",
    "ShardedServingPool",
    "PositionStore",
    "build_positions",
    "QueryEngine",
    "ServingPool",
    "BM25Params",
    "OracleIndex",
]
