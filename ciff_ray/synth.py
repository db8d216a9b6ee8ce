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
import pyarrow.compute as pc

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
    conv_starts = np.cumsum(turns_per_conv) - turns_per_conv
    turn_idx = (np.arange(n_turns) - conv_starts[conv_idx]).astype(np.int32)

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
    lengths = rng.poisson(mean_tokens, size=n_turns).astype(np.int64)
    lengths[rng.random(n_turns) < empty_frac] = 0
    # occasional duplicate-token-heavy turns (tf >> 1)
    dup_heavy = rng.random(n_turns) < 0.05
    # inverse-CDF draw: rng.choice(p=...) is ~30x slower at 10^7+ draws
    cdf = np.cumsum(probs)
    flat = np.searchsorted(
        cdf, rng.random(int(lengths.sum())), side="right"
    ).astype(np.int32)
    perm = rng.permutation(n_turns)

    # Fully vectorized text construction in PERMUTED row order (the
    # permutation applied up front instead of a table-level take, which
    # overflows 2 GiB int32 string offsets past ~10M rows).  Dup-heavy
    # rows append 5 copies of their first token before the join — same
    # strings as joining then string-appending.
    starts = np.cumsum(lengths) - lengths
    plen = lengths[perm]
    pstart = starts[perm]
    extra = np.where(dup_heavy[perm] & (plen > 0), 5, 0).astype(np.int64)
    new_len = plen + extra
    new_start = np.cumsum(new_len) - new_len
    total = int(new_len.sum())
    row_of_tok = np.repeat(np.arange(n_turns), new_len)
    pos = np.arange(total, dtype=np.int64) - new_start[row_of_tok]
    is_extra = pos >= plen[row_of_tok]
    tok_indices = flat[pstart[row_of_tok] + np.where(is_extra, 0, pos)]

    word_dict = pa.array(_WORDS, type=pa.string())
    text_chunks = []
    CH = 2_000_000  # rows per chunk: keeps each string chunk << 2 GiB
    for lo in range(0, n_turns, CH):
        hi = min(lo + CH, n_turns)
        s = int(new_start[lo])
        e = int(new_start[hi - 1] + new_len[hi - 1]) if hi > lo else s
        words_str = pc.cast(
            pa.DictionaryArray.from_arrays(
                pa.array(tok_indices[s:e], type=pa.int32()), word_dict
            ),
            pa.string(),
        )
        local_off = np.empty(hi - lo + 1, dtype=np.int32)
        local_off[:-1] = new_start[lo:hi] - s
        local_off[-1] = e - s
        la = pa.ListArray.from_arrays(pa.array(local_off), words_str)
        text_chunks.append(pc.binary_join(la, " "))
    if not text_chunks:
        text_chunks = [pa.array([], type=pa.string())]

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids[perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm], type=pa.int32()),
            "role": pa.array(roles[perm], type=pa.string()),
            "text": pa.chunked_array(text_chunks),
            "tool": pa.array(tools[perm], type=pa.string()),
            "ts": pa.array(ts[perm], type=pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    return tbl


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
