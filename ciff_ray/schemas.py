"""Arrow schemas + constants shared across the engine.

Mirrors the reference data model (SURVEY.md §1): transcripts are the
document stream, docmap is the DocRecord stream
(/root/reference/proto/common-index-format-v1.proto:51-55), postings is
the PostingsList stream (ibid:43-48), and the manifest is the Header
(ibid:10-34).
"""

from __future__ import annotations

import pyarrow as pa

# Input table shape from BASELINE.json `input_hint`.
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# DocRecord analogue (docid, collection_docid, doclength).
DOCMAP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("collection_docid", pa.string()),
        ("doclength", pa.int32()),
    ]
)

# Logical (uncompressed) postings view — one row per term, doc_ids
# absolute and strictly ascending, tfs parallel and > 0.
POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_ids", pa.large_list(pa.int32())),
        ("tfs", pa.large_list(pa.int32())),
    ]
)

# Physical segment row: one packed posting *slice* per (term, salt).
# Unsalted terms have exactly one slice with salt = 0.  Slices of a
# salted (heavy-hitter) term cover disjoint ascending doc_id ranges, so
# concatenating them in salt order restores the globally docID-ordered
# list without re-sorting (SURVEY.md §4 "skew").
SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),          # postings in this slice
        ("cf", pa.int64()),          # sum(tf) in this slice
        ("first_doc", pa.int64()),   # absolute docID of the first posting
        ("doc_codec", pa.int8()),    # codec id for gap bytes
        ("tf_codec", pa.int8()),     # codec id for tf bytes
        ("doc_bytes", pa.large_binary()),  # packed d-gaps (first gap = first_doc delta vs 0 omitted)
        ("tf_bytes", pa.large_binary()),   # packed tfs
        ("max_tf", pa.int32()),
        # Block-max metadata for WAND/BMW pruning: per fixed-size block
        # of postings, the last docID and the max BM25 term contribution
        # under the build-time default (k1, b).
        ("block_last_doc", pa.large_list(pa.int64())),
        ("block_max_score", pa.large_list(pa.float32())),
        # byte offset of each block's first gap/tf value inside
        # doc_bytes/tf_bytes — enables decoding a single block without
        # touching the rest of the slice (block-max WAND skipping).
        # -1 when the slice codec is not byte-aligned (Elias gamma).
        ("block_doc_off", pa.large_list(pa.int64())),
        ("block_tf_off", pa.large_list(pa.int64())),
    ]
)

TERM_DICT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("partition_id", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("max_score", pa.float32()),  # max BM25 contribution of the slice
    ]
)

# Codec ids (segment doc_codec / tf_codec values).
CODEC_VARINT = 0
CODEC_GAMMA = 1
# bit-packed 128-value blocks (PISA block-codec family): per block one
# width byte b then ceil(cnt*b/8) packed bytes.  Two ids because the two
# posting streams block differently: tf streams block uniformly at 128
# (CODEC_BP), doc-GAP streams carry df-1 values against 128-doc blocks,
# so their first block holds 127 values (CODEC_BPG) — this keeps codec
# blocks exactly aligned with the WAND block-max blocks, so the
# block-targeted decode path works unchanged.
CODEC_BP = 2
CODEC_BPG = 3

# Postings per block-max block.
BLOCK_SIZE = 128

MANIFEST_VERSION = 1
