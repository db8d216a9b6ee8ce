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


SAMPLE_EVERY = 4  # keep every 4th frame (the "frame-sample" rate)
RESIZE_STRIDE = 32  # strided downsample within a frame (the "resize")


class FrameSampleResize:
    """Actor-pool frame-sample + resize stage over the synthesized media
    blobs: explode each blob into FRAME_BYTES frames, keep every
    SAMPLE_EVERY-th frame, and "resize" each kept frame by a strided
    byte downsample (every RESIZE_STRIDE-th byte — the stand-in for a
    pixel resample, which needs the media libs this container lacks).

    Output is one row PER SAMPLED FRAME (the variable-rate explode a
    real video pipeline produces): (doc_id, frame_idx, frame_len,
    n_taps, tap_sum, resized).  Every column, including the resized
    payload bytes, is a pure function of the input bytes, so the whole
    stage is SQL-oracle-checkable.  Fully vectorized: flat Arrow byte
    buffer + repeat/arange index arithmetic, no per-row Python.
    """

    def __init__(
        self,
        frame_bytes: int = FRAME_BYTES,
        sample_every: int = SAMPLE_EVERY,
        stride: int = RESIZE_STRIDE,
    ):
        self.frame_bytes = frame_bytes
        self.sample_every = sample_every
        self.stride = stride

    _EMPTY = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("frame_idx", pa.int64()),
            ("frame_len", pa.int64()),
            ("n_taps", pa.int64()),
            ("tap_sum", pa.int64()),
            ("resized", pa.large_string()),
        ]
    ).empty_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = batch["media"].combine_chunks()
        if media.offset != 0:  # normalize sliced arrays before buffer math
            media = pa.concat_arrays([media])
        off = np.frombuffer(media.buffers()[1], dtype=np.int64)[
            : len(media) + 1
        ]
        flat = np.frombuffer(media.buffers()[2], dtype=np.uint8)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(off)  # bytes per doc
        fb, se, st = self.frame_bytes, self.sample_every, self.stride
        n_frames = -(-n // fb)  # ceil; 0 for empty blobs
        kept = -(-n_frames // se)  # frames with idx % se == 0
        total = int(kept.sum())
        if total == 0:
            return self._EMPTY
        # one row per kept frame
        doc_rep = np.repeat(np.arange(doc_ids.size), kept)
        row_starts = np.cumsum(kept) - kept
        frame_ord = np.arange(total) - row_starts[doc_rep]
        frame_idx = frame_ord * se
        frame_start = off[:-1][doc_rep] + frame_idx * fb
        frame_len = np.minimum(fb, n[doc_rep] - frame_idx * fb)
        n_taps = (frame_len + st - 1) // st
        # gather the strided taps of every frame in one flat index op
        tap_starts = np.cumsum(n_taps) - n_taps
        frame_rep = np.repeat(np.arange(total), n_taps)
        tap_ord = np.arange(int(n_taps.sum())) - tap_starts[frame_rep]
        vals = flat[frame_start[frame_rep] + tap_ord * st]
        tap_sum = np.add.reduceat(
            vals.astype(np.int64), tap_starts
        ) if vals.size else np.zeros(total, np.int64)
        tap_sum[n_taps == 0] = 0  # reduceat artifacts on empty frames
        # ASCII payload -> emit as string (BLOBs come back from DuckDB
        # as unhashable bytearrays, breaking the driver's value compare)
        resized = pa.Array.from_buffers(
            pa.large_string(),
            total,
            [
                None,
                pa.py_buffer(
                    np.concatenate([tap_starts, [vals.size]])
                    .astype(np.int64)
                    .tobytes()
                ),
                pa.py_buffer(vals.tobytes()),
            ],
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_rep], type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int64()),
                "frame_len": pa.array(frame_len, type=pa.int64()),
                "n_taps": pa.array(n_taps, type=pa.int64()),
                "tap_sum": pa.array(tap_sum, type=pa.int64()),
                "resized": resized,
            }
        )


def q_media_frames(sf_dir: str) -> ray.data.Dataset:
    """documents -> media blobs -> frame-sample + strided resize ->
    one row per sampled frame (doc_id, frame_idx, frame_len, n_taps,
    tap_sum, resized-bytes)."""
    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"],
        )
        .map_batches(synthesize_media, batch_format="pyarrow")
        .map_batches(
            FrameSampleResize,
            batch_format="pyarrow",
            concurrency=(1, 4),
            batch_size=256,
        )
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
    # byte-exact oracle for the frame-sample+resize stage: the synthetic
    # corpus is pure ASCII, so character positions == byte offsets and
    # unicode(substring(..)) reads the byte value the Ray stage taps.
    "media_frames": f"""
WITH d AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
fr AS (
  SELECT d.doc_id, d.text, d.n, CAST(fs.g AS BIGINT) AS frame_idx,
         CAST(least({FRAME_BYTES}, d.n - fs.g * {FRAME_BYTES}) AS BIGINT)
           AS frame_len
  FROM d, LATERAL (
    SELECT unnest(generate_series(0, CAST((d.n - 1) // {FRAME_BYTES} AS BIGINT),
                                   {SAMPLE_EVERY})) AS g
  ) fs
  WHERE d.n > 0
),
tp AS (
  SELECT fr.doc_id, fr.frame_idx, fr.frame_len, fr.text,
         fr.frame_idx * {FRAME_BYTES} + 1 + ts.g * {RESIZE_STRIDE} AS pos,
         ts.g AS tap_ord
  FROM fr, LATERAL (
    SELECT unnest(generate_series(
      0, CAST((fr.frame_len - 1) // {RESIZE_STRIDE} AS BIGINT))) AS g
  ) ts
)
SELECT doc_id, frame_idx,
       any_value(frame_len) AS frame_len,
       CAST(count(*) AS BIGINT) AS n_taps,
       CAST(sum(unicode(substring(text, CAST(pos AS BIGINT), 1))) AS BIGINT)
         AS tap_sum,
       string_agg(substring(text, CAST(pos AS BIGINT), 1),
                  '' ORDER BY tap_ord) AS resized
FROM tp
GROUP BY doc_id, frame_idx""",
}

QUERIES = {
    "media_features": q_media_features,
    "media_frames": q_media_frames,
}
