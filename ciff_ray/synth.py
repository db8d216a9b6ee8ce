"""Deterministic synthetic transcript tables (FIXTURES.md §1).

Two sources of transcripts, both fully deterministic:

* :func:`generate_transcripts` — seeded generator used by tests and the
  bench (Zipf vocabulary so heavy-hitter terms exist, empty turns,
  tf>1 turns, shuffled row order so nothing may depend on input order).
* :func:`transcripts_from_documents` / :data:`SQL_TRANSCRIPTS_CTE` — a
  SQL-expressible derivation of a transcripts table from the driver's
  `documents` table, used so the DuckDB oracle can build the *same*
  transcripts for the correctness gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ciff_ray.schemas import TRANSCRIPTS_SCHEMA

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

# Fixed wordlist; Zipf ranks make "the"/"of" stopword-scale heavy hitters.
_WORDS = (
    "the of and to in a is that for it as was with be by on not he i this are "
    "or his from at which but have an had they you were their one all we can "
    "her has there been if more when will would who so no out up into them "
    "then she time only could new other these two may first any my now such "
    "like our over man me even most made after also did many before must "
    "through back years where much your way well down should because each "
    "just those people mr how too little state good very make world still own "
    "see men work long get here between both life being under never day same "
    "another know while last might us great old year off come since against "
    "go came right used take three"
).split()

_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("", "", "", "search", "calculator", "browser", "")


def generate_transcripts(
    n_convs: int = 100,
    max_turns: int = 12,
    seed: int = 42,
    mean_tokens: int = 30,
    empty_frac: float = 0.01,
) -> pa.Table:
    """Seeded transcripts table; row order shuffled (docid assignment must
    depend only on the stable (conv_id, turn_idx) sort, FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    turns_per_conv = rng.integers(1, max_turns + 1, size=n_convs)
    n_turns = int(turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_idx = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)

    conv_ids = np.array([f"conv-{i:07d}" for i in range(n_convs)])[conv_idx]
    roles = np.array(_ROLES)[rng.integers(0, len(_ROLES), size=n_turns)]
    tools = np.array(_TOOLS)[rng.integers(0, len(_TOOLS), size=n_turns)]
    ts = EPOCH_US + conv_idx.astype(np.int64) * 86_400_000_000 + turn_idx.astype(
        np.int64
    ) * 1_000_000

    # Zipf token draw: P(word rank r) ∝ 1/(r+1)
    ranks = np.arange(len(_WORDS))
    probs = 1.0 / (ranks + 1.0)
    probs /= probs.sum()
    lengths = rng.poisson(mean_tokens, size=n_turns)
    lengths[rng.random(n_turns) < empty_frac] = 0
    # occasional duplicate-token-heavy turns (tf >> 1)
    dup_heavy = rng.random(n_turns) < 0.05
    flat = rng.choice(len(_WORDS), size=int(lengths.sum()), p=probs)
    words = np.array(_WORDS, dtype=object)[flat]
    bounds = np.cumsum(lengths)[:-1]
    texts = [" ".join(w) for w in np.split(words, bounds)]
    for i in np.flatnonzero(dup_heavy):
        if lengths[i] > 0:
            texts[i] = texts[i] + (" " + texts[i].split(" ")[0]) * 5

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    perm = rng.permutation(n_turns)
    return tbl.take(perm)


TURNS_PER_CONV_FROM_DOCS = 8


def transcripts_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministically reshape the driver `documents` table
    (doc_id dense 0..N-1, text, ...) into a transcripts table:
    conv_id = conv-{doc_id // 8:07d}, turn_idx = doc_id % 8.

    Must stay in lock-step with :data:`SQL_TRANSCRIPTS_CTE`."""
    doc_id = np.asarray(docs["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    k = TURNS_PER_CONV_FROM_DOCS
    conv = doc_id // k
    turn = (doc_id % k).astype(np.int32)
    conv_ids = np.array([f"conv-{c:07d}" for c in conv], dtype=object)
    roles = np.array(_ROLES, dtype=object)[(doc_id % len(_ROLES)).astype(np.int64)]
    ts = EPOCH_US + doc_id * 1_000_000
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": docs["text"].combine_chunks()
            if isinstance(docs["text"], pa.ChunkedArray)
            else docs["text"],
            "tool": pa.array([""] * len(docs), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


# DuckDB CTE producing the identical transcripts table from the
# pre-registered `documents` view.  Because doc_id is dense 0-based,
# turn_idx is dense per conversation and docid-by-(conv_id, turn_idx)
# rank equals doc_id — which the oracle SQL exploits.
SQL_TRANSCRIPTS_CTE = f"""
transcripts AS (
  SELECT
    'conv-' || lpad(CAST(doc_id // {TURNS_PER_CONV_FROM_DOCS} AS VARCHAR), 7, '0') AS conv_id,
    CAST(doc_id % {TURNS_PER_CONV_FROM_DOCS} AS INT) AS turn_idx,
    doc_id AS doc_id,
    text AS text
  FROM documents
)
"""
