"""Multimodal binary-column plumbing.

Media payloads are opaque `binary` columns with typed metadata; decode /
feature-extract runs as an actor-pool `map_batches` stage (model "load"
once per actor in __init__, work per batch in __call__).  The image /
audio libraries are not in this container, so the real decoder is a
clearly-marked stub (`RealDecoder` raises NotImplementedError) and the
pipeline uses `FakeDecoder`, a deterministic decode whose features are
pure functions of the bytes — making the Ray-side plumbing (schema,
batch size, actor signature, output layout) real and oracle-checkable:
the media blob is synthesized as the UTF-8 encoding of `documents.text`,
so n_bytes == octet_length(text) in SQL.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

FRAME_BYTES = 256  # fake "frame" granularity of the stub decoder

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media", pa.large_binary()),
        ("media_type", pa.string()),
    ]
)


def synthesize_media(batch: pa.Table) -> pa.Table:
    """(doc_id, text, source) -> (doc_id, media, media_type): the blob is
    the UTF-8 bytes of the text (deterministic fake payload; real
    pipelines read image/audio bytes from storage instead)."""
    media = pc.cast(batch["text"], pa.large_binary())
    mt = pc.binary_join_element_wise(
        pa.array(["fake"] * len(batch)), batch["source"].cast(pa.string()), "/"
    )
    return pa.table(
        {"doc_id": batch["doc_id"], "media": media, "media_type": mt},
        schema=MEDIA_SCHEMA,
    )


class RealDecoder:
    """Placeholder for a real decode stage (PIL / torchaudio / ffmpeg).

    STUB: the media libraries are not available in this environment."""

    def __init__(self):
        raise NotImplementedError(
            "media decode libraries (PIL/libav) are not installed in this "
            "container; use FakeDecoder for the plumbing path"
        )


class FakeDecoder:
    """Actor-pool decode stub: deterministic features from raw bytes.

    __init__ = the once-per-actor model load (here: a fixed projection
    matrix); __call__ = vectorized per-batch decode."""

    def __init__(self, frame_bytes: int = FRAME_BYTES):
        self.frame_bytes = frame_bytes
        # stand-in for model weights loaded once per actor
        self.proj = np.arange(8, dtype=np.int64) * 2654435761 % (2**31)

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch["media"].combine_chunks()
        n_bytes = pc.binary_length(media).to_numpy(zero_copy_only=False).astype(np.int64)
        n_frames = 1 + n_bytes // self.frame_bytes
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "n_frames": pa.array(n_frames, type=pa.int64()),
            }
        )


def q_media_features(sf_dir: str) -> ray.data.Dataset:
    """documents -> synthesized media blobs -> actor-pool decode stub ->
    (doc_id, n_bytes, n_frames)."""
    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )
        .map_batches(synthesize_media, batch_format="pyarrow")
        .map_batches(
            FakeDecoder,
            batch_format="pyarrow",
            concurrency=(1, 4),
            batch_size=256,  # binary payloads: keep batch x concurrency bounded
        )
    )


ORACLE_SQLS = {
    "media_features": f"""SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(1 + octet_length(encode(text)) // {FRAME_BYTES} AS BIGINT) AS n_frames
FROM documents""",
}

QUERIES = {
    "media_features": q_media_features,
}
