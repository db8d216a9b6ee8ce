"""As-of join over the `events` table — the temporal-join operator
class Ray Data has no primitive for (driver brief: "as-of join, range
join ... implement as a composition of map_batches +
groupby().map_groups + sort if semantics allow").

`q_asof_join`: for EVERY event, the most recent 'purchase' event of the
same user at or before its timestamp (the classic enrich-with-state
as-of).  Composition:

    map_batches    narrow rows (user_id, ts, event_id, value, is_ref)
                   + a user-hash partition key
    groupby(part)  co-locates each user's full event stream — the
    .map_groups    partitioning assumption the operator relies on —
                   and runs ONE vectorized as-of kernel per partition:
                   lexsort by (user, ts, ref-first), forward-fill the
                   last reference row index (np.maximum.accumulate),
                   invalidate fills that cross a user-run boundary.

Ties: a reference row at exactly the left row's timestamp matches
(DuckDB ASOF `e.ts >= p.ts` semantics); a purchase therefore matches
itself.  Nulls are COALESCEd to (-1, 0.0) on BOTH sides so the driver
value-hash sees identical dtypes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ASOF_REF_TYPE = "purchase"
ASOF_PARTS = 32


def _event_rows(batch: pa.Table) -> pa.Table:
    """events -> narrow as-of input rows; ts kept as int64 microseconds
    (identical ordering to the SQL timestamp compare)."""
    ts = batch["ts"].combine_chunks().cast(pa.int64())
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    is_ref = pc.equal(batch["event_type"], ASOF_REF_TYPE)
    return pa.table(
        {
            "user_id": pa.array(user, type=pa.int64()),
            "ts_us": ts,
            "event_id": batch["event_id"],
            "value": batch["value"],
            "is_ref": is_ref,
            "part": pa.array((user % ASOF_PARTS).astype(np.int32)),
        }
    )


def _asof_in_part(group: pa.Table) -> pa.Table:
    """One user-hash partition -> (event_id, ref_event_id, ref_value)
    via the vectorized forward-fill as-of kernel."""
    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "ref_event_id": pa.array([], type=pa.int64()),
            "ref_value": pa.array([], type=pa.float64()),
        }
    )
    n = len(group)
    if n == 0:
        return empty
    user = group["user_id"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    eid = group["event_id"].to_numpy(zero_copy_only=False)
    val = group["value"].to_numpy(zero_copy_only=False)
    is_ref = group["is_ref"].to_numpy(zero_copy_only=False)
    # ref rows FIRST at equal (user, ts) so an equal-timestamp reference
    # is visible to the left row (>= semantics)
    order = np.lexsort((~is_ref, ts, user))
    user, ts, eid, val, is_ref = (
        user[order], ts[order], eid[order], val[order], is_ref[order],
    )
    pos = np.arange(n)
    ref_pos = np.where(is_ref, pos, -1)
    last_ref = np.maximum.accumulate(ref_pos)
    run_start_idx = np.concatenate(
        [[0], np.flatnonzero(user[1:] != user[:-1]) + 1]
    )
    starts = np.repeat(
        run_start_idx, np.diff(np.concatenate([run_start_idx, [n]]))
    )
    valid = last_ref >= starts
    matched = np.where(valid, last_ref, 0)
    ref_eid = np.where(valid, eid[matched], -1)
    ref_val = np.where(valid, val[matched], 0.0)
    return pa.table(
        {
            "event_id": pa.array(eid, type=pa.int64()),
            "ref_event_id": pa.array(ref_eid, type=pa.int64()),
            "ref_value": pa.array(ref_val, type=pa.float64()),
        }
    )


def q_asof_join(sf_dir: str) -> ray.data.Dataset:
    """(event_id, ref_event_id, ref_value): every event joined as-of to
    the same user's latest 'purchase' at or before it (-1/0.0 when
    none)."""
    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return (
        events.map_batches(_event_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_asof_in_part, batch_format="pyarrow")
    )


ORACLE_SQLS = {
    "asof_join": f"""WITH p AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = '{ASOF_REF_TYPE}'
)
SELECT e.event_id,
       CAST(coalesce(p.event_id, -1) AS BIGINT) AS ref_event_id,
       coalesce(p.value, 0.0) AS ref_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts >= p.ts""",
}

QUERIES = {
    "asof_join": q_asof_join,
}


# ---------------------------------------------------------------------------
# range join: orders x events on key + time interval

RANGE_DAYS = 30
_RANGE_US = RANGE_DAYS * 86_400 * 1_000_000


def _range_rows(batch: pa.Table, *, side: int) -> pa.Table:
    """Either table -> tagged narrow rows on the shared key space
    (orders.o_custkey == events.user_id), ts as int64 us."""
    if side == 0:  # orders
        key = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].combine_chunks().cast(pa.int64())
        rid = batch["o_orderkey"]
    else:  # events
        key = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64())
        rid = batch["event_id"]
    return pa.table(
        {
            "key": pa.array(key, type=pa.int64()),
            "ts_us": ts,
            "row_id": rid,
            "side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "part": pa.array((key % ASOF_PARTS).astype(np.int32)),
        }
    )


def _lex_ranks(
    e_key: np.ndarray, e_ts: np.ndarray, q_key: np.ndarray, q_ts: np.ndarray
) -> np.ndarray:
    """Per query (k, t): the number of events (ek, et) with
    (ek, et) < (k, t) lexicographically — a vectorized composite-key
    searchsorted('left'): ONE lexsort of the tagged union (queries
    ordered before equal-key-and-ts events), then a cumulative event
    count.  No per-key Python; cost is flat in distinct-key count."""
    m, q = e_key.size, q_key.size
    keys = np.concatenate([e_key, q_key])
    tss = np.concatenate([e_ts, q_ts])
    tag = np.concatenate([np.ones(m, np.int8), np.zeros(q, np.int8)])
    order = np.lexsort((tag, tss, keys))
    cum = np.cumsum(tag[order], dtype=np.int64)
    inv = np.empty(m + q, dtype=np.int64)
    inv[order] = np.arange(m + q)
    return cum[inv[m:]]


def _range_count_in_part(group: pa.Table) -> pa.Table:
    """One key-hash partition of the tagged union -> per-order event
    counts within [o_orderdate, o_orderdate + RANGE_DAYS): count =
    rank(key, start + R) - rank(key, start) over the lexicographic
    (key, ts) event order, both rank vectors from one _lex_ranks merge
    — fully vectorized, no per-key loop."""
    side = group["side"].to_numpy(zero_copy_only=False)
    key = group["key"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    rid = group["row_id"].to_numpy(zero_copy_only=False)
    is_order = side == 0
    o_key, o_ts, o_id = key[is_order], ts[is_order], rid[is_order]
    e_key, e_ts = key[~is_order], ts[~is_order]
    if o_key.size == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
            }
        )
    n = o_key.size
    ranks = _lex_ranks(
        e_key,
        e_ts,
        np.concatenate([o_key, o_key]),
        np.concatenate([o_ts, o_ts + _RANGE_US]),
    )
    counts = ranks[n:] - ranks[:n]
    return pa.table(
        {
            "o_orderkey": pa.array(o_id, type=pa.int64()),
            "n_events": pa.array(counts, type=pa.int64()),
        }
    )


def q_range_join(sf_dir: str) -> ray.data.Dataset:
    """Range join (key + time interval): per order, the number of the
    same user's events with ts in [o_orderdate, o_orderdate + 30 days).
    Both sides are tagged, key-hash co-located in ONE exchange, and
    each partition answers all its orders with two searchsorted calls
    per key run — the interval-join operator class."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_range_rows, fn_kwargs={"side": 0}, batch_format="pyarrow")
    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    ).map_batches(_range_rows, fn_kwargs={"side": 1}, batch_format="pyarrow")
    return (
        orders.union(events)
        .groupby("part")
        .map_groups(_range_count_in_part, batch_format="pyarrow")
    )


ORACLE_SQLS["range_join"] = f"""SELECT o.o_orderkey,
       CAST(count(e.event_id) AS BIGINT) AS n_events
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL {RANGE_DAYS} DAY
GROUP BY o.o_orderkey"""

QUERIES["range_join"] = q_range_join


# ---------------------------------------------------------------------------
# sessionization: gap-based session assignment + per-session rollup

SESSION_GAP_US = 2 * 3600 * 1_000_000  # new session after a 2h silence


def _session_rows(batch: pa.Table) -> pa.Table:
    """events -> narrow sessionization rows; value carried as integer
    cents (order-independent exact sums, same rationale as
    relational.q_nation_revenue)."""
    ts = batch["ts"].combine_chunks().cast(pa.int64())
    user = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch["value"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "user_id": pa.array(user, type=pa.int64()),
            "ts_us": ts,
            "cents": pa.array(
                np.round(val * 100.0).astype(np.int64), type=pa.int64()
            ),
            "part": pa.array((user % ASOF_PARTS).astype(np.int32)),
        }
    )


def _sessions_in_part(group: pa.Table) -> pa.Table:
    """One user-hash partition -> per-session rollups.  Vectorized:
    lexsort by (user, ts), break where the gap to the previous event of
    the SAME user exceeds SESSION_GAP_US, cumulative-sum the breaks into
    session ids, reduceat the rollups.  Equal-timestamp ties share a
    session regardless of order (gap 0), so the kernel is
    order-deterministic without a tiebreaker."""
    n = len(group)
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "session_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "start_us": pa.array([], type=pa.int64()),
                "end_us": pa.array([], type=pa.int64()),
                "value_r": pa.array([], type=pa.float64()),
            }
        )
    user = group["user_id"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    cents = group["cents"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ts, user))
    user, ts, cents = user[order], ts[order], cents[order]
    new_user = np.concatenate([[True], user[1:] != user[:-1]])
    gap_break = np.concatenate([[True], (ts[1:] - ts[:-1]) > SESSION_GAP_US])
    brk = new_user | gap_break
    gsid = np.cumsum(brk) - 1  # globally distinct (every user starts one)
    starts = np.flatnonzero(brk)
    ends = np.concatenate([starts[1:], [n]])
    # per-user 1-based session ordinal: global sid minus the user's
    # first sid (forward-filled; gsid is nondecreasing)
    first_sid_of_user = np.where(new_user, gsid, 0)
    first_sid_of_user = np.maximum.accumulate(first_sid_of_user)
    sid_in_user = gsid - first_sid_of_user + 1
    sums = np.add.reduceat(cents, starts)
    return pa.table(
        {
            "user_id": pa.array(user[starts], type=pa.int64()),
            "session_id": pa.array(sid_in_user[starts], type=pa.int64()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
            "start_us": pa.array(ts[starts], type=pa.int64()),
            "end_us": pa.array(ts[ends - 1], type=pa.int64()),
            "value_r": pa.array(
                np.round(sums / 100.0, 2), type=pa.float64()
            ),
        }
    )


def q_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization over the event stream (the stateful
    streaming-window operator class): a session is a maximal run of a
    user's events with inter-event silence <= 2h; output one rollup row
    per session (user_id, 1-based session_id, n_events, start/end
    microseconds, exact value sum).  Same shuffle shape as the as-of
    join: ONE user-hash exchange, then a fully vectorized per-partition
    kernel."""
    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "value"],
    )
    return (
        events.map_batches(_session_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sessions_in_part, batch_format="pyarrow")
    )


ORACLE_SQLS["sessionize"] = f"""WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
o AS (
  SELECT user_id, ts_us, cents,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
s AS (
  SELECT user_id, ts_us, cents,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       round(SUM(cents) / 100.0, 2) AS value_r
FROM s GROUP BY user_id, session_id"""

QUERIES["sessionize"] = q_sessionize


# ---------------------------------------------------------------------------
# funnel analysis — ordered-step conversion over the event stream

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_PARTS = 32


def _funnel_rows(batch: pa.Table) -> pa.Table:
    """events -> (part, user_id, ts, step) rows for funnel step events
    only (non-step types pruned before the exchange)."""
    et = batch["event_type"].combine_chunks() if isinstance(
        batch["event_type"], pa.ChunkedArray
    ) else batch["event_type"]
    step = np.full(len(batch), -1, dtype=np.int8)
    for i, s in enumerate(FUNNEL_STEPS):
        step[pc.equal(et, s).to_numpy(zero_copy_only=False)] = i
    keep = step >= 0
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    ts = batch["ts"].to_numpy(zero_copy_only=False).view(np.int64)[keep]
    return pa.table(
        {
            "part": pa.array((uid % FUNNEL_PARTS).astype(np.int32)),
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()),
            "step": pa.array(step[keep], type=pa.int8()),
        }
    )


def _funnel_part_counts(group: pa.Table) -> pa.Table:
    """One user-hash partition -> per-step user-count partials: greedy
    earliest-event subsequence matching, fully vectorized — per step, a
    masked np.minimum.at over the user slots (greedy-earliest is
    optimal for subsequence existence; ties in ts do NOT chain, strict
    >, matching the oracle's `ts > prev`)."""
    if len(group) == 0:
        return pa.table(
            {
                "step": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64()),
            }
        )
    uid = group["user_id"].to_numpy(zero_copy_only=False)
    ts = group["ts"].to_numpy(zero_copy_only=False)
    step = group["step"].to_numpy(zero_copy_only=False)
    users, uidx = np.unique(uid, return_inverse=True)
    prev = np.full(users.size, -np.inf)
    counts = []
    for s in range(len(FUNNEL_STEPS)):
        cur = np.full(users.size, np.inf)
        sel = (step == s) & (ts > prev[uidx])
        if sel.any():
            np.minimum.at(cur, uidx[sel], ts[sel].astype(np.float64))
        counts.append(int(np.isfinite(cur).sum()))
        prev = cur
    return pa.table(
        {
            "step": pa.array(
                np.arange(1, len(FUNNEL_STEPS) + 1, dtype=np.int64)
            ),
            "n_users": pa.array(np.array(counts, dtype=np.int64)),
        }
    )


def _funnel_final(batch: pa.Table) -> pa.Table:
    s = batch["step"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "step": pa.array(s, type=pa.int64()),
            "step_name": pa.array(
                [FUNNEL_STEPS[i - 1] for i in s], type=pa.string()
            ),
            "n_users": batch["n_users"],
        }
    )


def q_funnel(sf_dir: str) -> ray.data.Dataset:
    """Funnel conversion over the event stream: how many users reach
    step k of view -> click -> purchase as a strictly-time-ordered
    subsequence of their own events.  Shape: step events pruned at the
    read side, one user-hash exchange co-locates each user's stream,
    per-partition vectorized greedy matching, a 3-row count merge.

    Float-exactness note: timestamps pass through float64 inside the
    kernel for the +/-inf sentinels — exact for any timestamp below
    2^53 us (~year 2255)."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return (
        ev.map_batches(_funnel_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_funnel_part_counts, batch_format="pyarrow")
        .groupby("step")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(_funnel_final, batch_format="pyarrow")
    )


ORACLE_SQLS["funnel"] = f"""WITH
s1 AS (SELECT user_id, min(ts) AS t FROM events
       WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
       WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
       WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id)
SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_name,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}',
       CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}',
       CAST((SELECT count(*) FROM s3) AS BIGINT)"""

QUERIES["funnel"] = q_funnel


# ---------------------------------------------------------------------------
# cohort retention — weekly signup cohorts x activity-week offsets

_US_PER_DAY = 86_400_000_000


def _week_start_day(ts_us: np.ndarray) -> np.ndarray:
    """ISO (Monday-start) week truncation on epoch-microsecond ints —
    exactly DuckDB's date_trunc('week'): 1970-01-01 was a Thursday, so
    weekday(Monday=0) = (epoch_day + 3) % 7."""
    days = ts_us // _US_PER_DAY
    return days - (days + 3) % 7


def _cohort_rows(batch: pa.Table) -> pa.Table:
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts"].to_numpy(zero_copy_only=False).view(np.int64)
    return pa.table(
        {
            "part": pa.array((uid % FUNNEL_PARTS).astype(np.int32)),
            "user_id": pa.array(uid, type=pa.int64()),
            "week_day": pa.array(_week_start_day(ts), type=pa.int64()),
        }
    )


def _cohort_part_counts(group: pa.Table) -> pa.Table:
    """One user-hash partition -> (cohort_day, week_offset, n) partials:
    per-user first week = cohort; per-user DISTINCT activity weeks
    (exact here — the user's whole stream is co-located); one bincount
    per (cohort, offset) key."""
    if len(group) == 0:
        return pa.table(
            {
                "cohort_day": pa.array([], type=pa.int64()),
                "week_offset": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    uid = group["user_id"].to_numpy(zero_copy_only=False)
    wd = group["week_day"].to_numpy(zero_copy_only=False)
    users, uidx = np.unique(uid, return_inverse=True)
    first = np.full(users.size, np.iinfo(np.int64).max)
    np.minimum.at(first, uidx, wd)
    # per-user distinct weeks: unique composite (user, week)
    key = uidx * np.int64(1 << 32) + ((wd - first[uidx]) // 7)
    ks = np.unique(key)
    ku = (ks >> np.int64(32)).astype(np.int64)
    off = (ks & np.int64(0xFFFFFFFF)).astype(np.int64)
    ckey = first[ku] * np.int64(1 << 16) + off
    cs, counts = np.unique(ckey, return_counts=True)
    return pa.table(
        {
            "cohort_day": pa.array(cs >> np.int64(16), type=pa.int64()),
            "week_offset": pa.array(
                cs & np.int64(0xFFFF), type=pa.int64()
            ),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def _cohort_final(batch: pa.Table) -> pa.Table:
    import datetime

    cd = batch["cohort_day"].to_numpy(zero_copy_only=False).astype(np.int64)
    weeks = [
        (datetime.date(1970, 1, 1) + datetime.timedelta(days=int(d)))
        .isoformat()
        for d in cd
    ]
    return pa.table(
        {
            "cohort_week": pa.array(weeks, type=pa.string()),
            "week_offset": batch["week_offset"],
            "n_users": batch["n"],
        }
    )


def q_cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Weekly cohort retention: users grouped by the Monday-start week
    of their FIRST event; for each later week offset, how many of that
    cohort were active (>= 1 event).  One user-hash exchange (each
    user's stream co-located -> exact per-partition distinct weeks),
    then a tiny (cohort, offset) Sum."""
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return (
        ev.map_batches(_cohort_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_cohort_part_counts, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_cohort_final, batch_format="pyarrow")
    )


ORACLE_SQLS["cohort_retention"] = """WITH
f AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT e.user_id, f.cw,
         date_diff('week', f.cw, date_trunc('week', e.ts)) AS off
  FROM events e JOIN f USING (user_id)
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(off AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cw, off"""

QUERIES["cohort_retention"] = q_cohort_retention
