"""Index integrity checker ("fsck" for a ciff_ray index directory).

At 100 TB an index is thousands of Parquet segments produced across
node failures, resumes, merges, compactions and deletes; an operator
needs a cheap way to answer "is this index internally consistent?"
before serving it.  The reference scatters its guards through the read
paths (e.g. the negative-docID / ascending checks,
/root/reference/src/binary_collection.rs element iteration); this
module concentrates them into ONE distributed validation pass that
returns a findings table (empty ⇒ clean).

Checks, all expressed as Dataset ops so they stream at index scale:

segments (map_batches actor pool, one pass):
  * slice decode round-trip: docIDs strictly ascending, first_doc ≥ 0,
    last doc < num_docs, every tf ≥ 1
  * stored df / cf / max_tf equal the decoded count / Σtf / max tf
  * block metadata: block_last_doc ascending with the final entry equal
    to the slice's last doc, block count = ceil(df / block_size)
  * block_max_score is a VALID UPPER BOUND of the idf-independent
    contribution recomputed in float64 from the docmap doclengths
    (build.py stores the one-ulp-up float32, so `stored ≥ recomputed`
    is exact, no tolerance) — an invalid bound silently corrupts
    MaxScore/BMW results, the worst failure mode to detect late
  * per-batch (term, df, cf) partials are emitted alongside findings

term_stats cross-check (shuffle of vocabulary-sized slim rows):
  * segment-derived Σdf / Σcf per term vs the stored term_stats rows,
    via a signed union (+1 segments, −1 stats) → groupby(term).sum →
    any nonzero row is a finding; no driver-side vocabulary

docmap (map_batches, one pass):
  * global count / min / max / Σ / Σ² match the dense 0..N−1 moments
    (sound against corruption, documented as not adversarial-proof;
    rows within a docmap file are NOT required to be sorted)
  * Σ doclength == manifest.total_terms_in_collection,
    avgdl == Σ / N, doclength ≥ 0

manifest / layout:
  * every partition's segment + done marker present, fingerprints match
  * tombstones (if any) within [0, num_docs)

derived stores (each against the frequency index):
  * positional store — check_positions: row structure, partition
    placement, signed per-term (rows, Σ positions) vs (df, cf)
  * pruned index — check_pruned: tau-bound soundness audit
  * doc-norms store — check_norms: docid density moments + the
    postings energy identity Σ norm² == Σ ((1+ln tf)·ln(N/df))²
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray import codecs
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.query import DoclengthStore

_FINDING_SCHEMA = pa.schema(
    [
        ("check", pa.string()),
        ("scope", pa.string()),
        ("detail", pa.string()),
    ]
)


def _findings(rows: list[tuple[str, str, str]]) -> pa.Table:
    return pa.table(
        {
            "check": pa.array([r[0] for r in rows], type=pa.string()),
            "scope": pa.array([r[1] for r in rows], type=pa.string()),
            "detail": pa.array([r[2] for r in rows], type=pa.string()),
        },
        schema=_FINDING_SCHEMA,
    )


class _SegmentChecker:
    """One pass over segment slices: structural checks + signed
    (term, df, cf) partials for the term_stats cross-check."""

    def __init__(self, index_dir: str) -> None:
        self._paths = IndexPaths(index_dir)
        m = Manifest.read(self._paths.manifest)
        self._n_docs = m.num_docs
        self._bs = m.block_size
        self._k1, self._b = m.k1, m.b
        self._avgdl = m.average_doclength
        self._dl = DoclengthStore(self._paths.docmap_dir, m.num_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bad: list[tuple[str, str, str]] = []
        terms = batch["term"].to_pylist()
        salts = batch["salt"].to_numpy(zero_copy_only=False)
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        cfs = batch["cf"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        maxtf = batch["max_tf"].to_numpy(zero_copy_only=False)
        dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
        tcodec = batch["tf_codec"].to_numpy(zero_copy_only=False)
        # per-slice last docID (decoded), −1 where decode failed: the
        # salt-interleave check consumes these alongside the partials
        last_doc = np.full(batch.num_rows, -1, dtype=np.int64)
        for i, term in enumerate(terms):
            scope = f"{term!r}/salt={int(salts[i])}"
            df = int(dfs[i])
            if df <= 0 or int(firsts[i]) < 0:
                bad.append(("slice_header", scope, f"df={df} first={firsts[i]}"))
                continue
            try:
                gaps = codecs.decode(
                    batch["doc_bytes"][i].as_py(), df - 1, int(dcodec[i])
                ).astype(np.int64)
                tfs = codecs.decode(
                    batch["tf_bytes"][i].as_py(), df, int(tcodec[i])
                ).astype(np.int64)
            except Exception as e:  # noqa: BLE001 — corrupt payloads land here
                bad.append(("slice_decode", scope, f"{type(e).__name__}: {e}"))
                continue
            docs = np.empty(df, dtype=np.int64)
            docs[0] = int(firsts[i])
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += docs[0]
            last_doc[i] = int(docs[-1])
            if df > 1 and (gaps <= 0).any():
                bad.append(("docids_ascending", scope, "non-positive d-gap"))
            if int(docs[-1]) >= self._n_docs:
                bad.append(
                    ("docid_range", scope, f"last={docs[-1]} >= N={self._n_docs}")
                )
                continue
            if (tfs < 1).any():
                bad.append(("tf_positive", scope, f"min tf={int(tfs.min())}"))
            if int(tfs.sum()) != int(cfs[i]):
                bad.append(("cf_mismatch", scope, f"{tfs.sum()} != {cfs[i]}"))
            if int(tfs.max()) != int(maxtf[i]):
                bad.append(("max_tf_mismatch", scope, f"{tfs.max()} != {maxtf[i]}"))
            last = batch["block_last_doc"][i].as_py()
            bmax = np.asarray(batch["block_max_score"][i].as_py(), np.float64)
            nblk = -(-df // self._bs)
            if len(last) != nblk or bmax.size != nblk:
                bad.append(
                    ("block_count", scope, f"{len(last)}/{bmax.size} != {nblk}")
                )
                continue
            if last[-1] != int(docs[-1]) or (np.diff(last) <= 0).any():
                bad.append(("block_last_doc", scope, "not ascending to last doc"))
            dl = self._dl[docs].astype(np.float64)
            contrib = (
                tfs
                * (self._k1 + 1.0)
                / (tfs + self._k1 * (1.0 - self._b + self._b * dl / self._avgdl))
            )
            bstart = np.arange(nblk, dtype=np.int64) * self._bs
            actual = np.maximum.reduceat(contrib, bstart)
            if (bmax < actual).any():
                j = int(np.argmax(bmax < actual))
                bad.append(
                    (
                        "block_max_bound",
                        scope,
                        f"block {j}: stored {bmax[j]} < actual {actual[j]}",
                    )
                )
        # one output table carries BOTH row kinds (typed, null-free):
        # findings (check/scope/detail set) and signed (term, df, cf)
        # partials for the term_stats cross-check — so the expensive
        # slice decode happens exactly once
        nf, np_ = len(bad), batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["finding"] * nf + ["partial"] * np_),
                "check": pa.array(
                    [r[0] for r in bad] + [""] * np_, type=pa.string()
                ),
                "scope": pa.array(
                    [r[1] for r in bad] + [""] * np_, type=pa.string()
                ),
                "detail": pa.array(
                    [r[2] for r in bad] + [""] * np_, type=pa.string()
                ),
                "term": pa.concat_arrays(
                    [
                        pa.array([""] * nf, type=pa.string()),
                        batch["term"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "df_s": pa.concat_arrays(
                    [
                        pa.array([0] * nf, type=pa.int64()),
                        batch["df"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "cf_s": pa.concat_arrays(
                    [
                        pa.array([0] * nf, type=pa.int64()),
                        batch["cf"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                # salt-interleave inputs (−1 lo/hi on finding rows and
                # undecodable slices — skipped by the group check)
                "salt": pa.concat_arrays(
                    [
                        pa.array([-1] * nf, type=pa.int32()),
                        batch["salt"].combine_chunks().cast(pa.int32()),
                    ]
                ),
                "lo": pa.concat_arrays(
                    [
                        pa.array([-1] * nf, type=pa.int64()),
                        batch["first_doc"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "hi": pa.concat_arrays(
                    [
                        pa.array([-1] * nf, type=pa.int64()),
                        pa.array(last_doc, type=pa.int64()),
                    ]
                ),
            }
        )


def check_index(index_dir: str, concurrency=(1, 8)) -> pa.Table:
    """Run every check; returns the findings table (0 rows ⇒ clean)."""
    paths = IndexPaths(index_dir)
    findings: list[tuple[str, str, str]] = []

    # ---- manifest / layout (driver-side, O(partitions)) -----------------
    try:
        m = Manifest.read(paths.manifest)
    except Exception as e:  # noqa: BLE001
        return _findings([("manifest", index_dir, f"unreadable: {e}")])
    for pid in range(m.num_partitions):
        if not os.path.exists(paths.segment(pid)):
            findings.append(("segment_missing", f"part-{pid:05d}", ""))
        done = paths.segment_done(pid)
        if not os.path.exists(done):
            findings.append(("done_marker_missing", f"part-{pid:05d}", ""))
        else:
            try:
                mk = json.load(open(done))
                if (
                    m.input_fingerprint
                    and mk.get("fingerprint")
                    and mk["fingerprint"] != m.input_fingerprint
                ):
                    findings.append(
                        (
                            "fingerprint_mismatch",
                            f"part-{pid:05d}",
                            f"{mk['fingerprint']} != {m.input_fingerprint}",
                        )
                    )
            except Exception as e:  # noqa: BLE001
                findings.append(("done_marker_corrupt", f"part-{pid:05d}", str(e)))
    if os.path.exists(paths.tombstones):
        dead = pq.read_table(paths.tombstones)["doc_id"].to_numpy(
            zero_copy_only=False
        )
        if dead.size and (int(dead.min()) < 0 or int(dead.max()) >= m.num_docs):
            findings.append(
                ("tombstone_range", "tombstones.parquet",
                 f"[{dead.min()}, {dead.max()}] outside [0, {m.num_docs})")
            )
    if findings:
        # structural damage: per-slice checks would just crash on it
        return _findings(findings)

    # ---- segments: one distributed pass ---------------------------------
    mixed = ray.data.read_parquet(
        paths.segments_dir,
        file_extensions=["parquet"],
        columns=[
            "term", "salt", "df", "cf", "first_doc", "doc_codec",
            "tf_codec", "doc_bytes", "tf_bytes", "max_tf",
            "block_last_doc", "block_max_score",
        ],
    ).map_batches(
        _SegmentChecker,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    mixed = mixed.materialize()  # findings + vocabulary-sized partials
    import pyarrow.compute as pc

    def _only_findings(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["kind"], "finding")).select(
            ["check", "scope", "detail"]
        )

    for r in mixed.map_batches(_only_findings, batch_format="pyarrow").take_all():
        findings.append((r["check"], r["scope"], r["detail"]))

    # ---- term_stats cross-check: signed union, no driver vocabulary -----
    from ray.data.aggregate import Sum

    def _sign_partials(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["kind"], "partial")).select(
            ["term", "df_s", "cf_s"]
        )

    seg_side = mixed.map_batches(_sign_partials, batch_format="pyarrow")

    def _neg_stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": t["term"],
                "df_s": pa.compute.multiply(t["df"], -1),
                "cf_s": pa.compute.multiply(t["cf"], -1),
            }
        )

    stats_side = ray.data.read_parquet(
        paths.term_stats, file_extensions=["parquet"],
        columns=["term", "df", "cf"],
    ).map_batches(_neg_stats, batch_format="pyarrow")

    # a statically PRUNED index (prune_meta.parquet present) keeps the
    # SOURCE's term_stats by design (global scoring stats preserved,
    # ciff_ray/pruned.py), so segment-derived df/cf may be SMALLER than
    # stats — only a surplus is corruption there; exact tau soundness
    # is check_pruned's job
    is_pruned = os.path.exists(os.path.join(index_dir, "prune_meta.parquet"))

    def _nonzero(t: pa.Table) -> pa.Table:
        if is_pruned:
            return t.filter(
                pc.or_(pc.greater(t["df_d"], 0), pc.greater(t["cf_d"], 0))
            )
        return t.filter(
            pc.or_(pc.not_equal(t["df_d"], 0), pc.not_equal(t["cf_d"], 0))
        )

    residue = (
        seg_side.union(stats_side)
        .groupby("term")
        .aggregate(Sum("df_s", alias_name="df_d"), Sum("cf_s", alias_name="cf_d"))
        .map_batches(_nonzero, batch_format="pyarrow")
        .take_all()
    )
    for r in residue:
        findings.append(
            ("term_stats_mismatch" if not is_pruned else "term_stats_surplus",
             repr(r["term"]),
             f"df_delta={r['df_d']} cf_delta={r['cf_d']}")
        )

    # ---- salt interleave: a term's salted slices must cover DISJOINT
    # ascending docID ranges in salt order — the invariant postings()
    # concatenation and metadata-only merges rely on -------------------
    def _salt_rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t["kind"], "partial"), pc.greater_equal(t["hi"], 0)
        )
        return t.filter(keep).select(["term", "salt", "lo", "hi"])

    def _salt_check(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _findings([])
        term = g["term"][0].as_py()
        salt = g["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = g["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = g["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(salt, kind="stable")
        salt, lo, hi = salt[order], lo[order], hi[order]
        bad: list[tuple[str, str, str]] = []
        if (np.diff(salt) == 0).any():
            bad.append(("salt_duplicate", repr(term), "repeated salt id"))
        if (lo[1:] <= hi[:-1]).any():
            j = int(np.argmax(lo[1:] <= hi[:-1]))
            bad.append(
                ("salt_range_overlap", repr(term),
                 f"salt {int(salt[j])} ends at {int(hi[j])} but salt "
                 f"{int(salt[j + 1])} starts at {int(lo[j + 1])}")
            )
        return _findings(bad)

    for r in (
        mixed.map_batches(_salt_rows, batch_format="pyarrow")
        .groupby("term")
        .map_groups(_salt_check, batch_format="pyarrow")
        .take_all()
    ):
        findings.append((r["check"], r["scope"], r["detail"]))

    # ---- docmap: density moments + doclength totals ----------------------
    def _docmap_partials(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = t["doclength"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([d.size], type=pa.int64()),
                "mn": pa.array([int(d.min()) if d.size else 0], type=pa.int64()),
                "mx": pa.array([int(d.max()) if d.size else -1], type=pa.int64()),
                "s": pa.array([int(d.sum())], type=pa.int64()),
                "s2": pa.array([int((d * d).sum())], type=pa.int64()),
                "dlsum": pa.array([int(dl.sum())], type=pa.int64()),
                "dlneg": pa.array([int((dl < 0).sum())], type=pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            paths.docmap_dir,
            file_extensions=["parquet"],
            columns=["doc_id", "doclength"],
        )
        .map_batches(_docmap_partials, batch_format="pyarrow")
        .take_all()
    )
    n = sum(p["n"] for p in parts)
    mn = min(p["mn"] for p in parts)
    mx = max(p["mx"] for p in parts)
    s = sum(p["s"] for p in parts)
    s2 = sum(p["s2"] for p in parts)
    dlsum = sum(p["dlsum"] for p in parts)
    dlneg = sum(p["dlneg"] for p in parts)
    N = m.num_docs
    if n != N:
        findings.append(("docmap_count", "docmap", f"{n} rows != num_docs {N}"))
    if N and (mn != 0 or mx != N - 1):
        findings.append(("docmap_bounds", "docmap", f"[{mn}, {mx}] != [0, {N-1}]"))
    if s != N * (N - 1) // 2 or s2 != (N - 1) * N * (2 * N - 1) // 6:
        findings.append(
            ("docmap_density_moments", "docmap",
             "Σ/Σ² do not match dense 0..N-1")
        )
    if dlneg:
        findings.append(("doclength_negative", "docmap", f"{dlneg} rows"))
    if dlsum != m.total_terms_in_collection:
        findings.append(
            ("total_terms_mismatch", "docmap",
             f"Σ doclength {dlsum} != manifest {m.total_terms_in_collection}")
        )
    if N and abs(dlsum / N - m.average_doclength) > 1e-9:
        findings.append(
            ("avgdl_mismatch", "manifest",
             f"{dlsum / N} != {m.average_doclength}")
        )

    return _findings(findings)


# ---------------------------------------------------------------------------
# positional store (ciff_ray.positions layout)


class _PosChecker:
    """One pass over positional-store rows: per-row structural checks
    (strictly ascending non-negative positions, correct term-hash
    partition) + signed per-term (df, Σ positions) partials for the
    index cross-check."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ciff_ray.layout import stable_hash
        from ciff_ray.positions import POS_PARTS

        bad: list[tuple[str, str, str]] = []
        terms = batch["term"].to_pylist()
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos_col = batch["positions"].combine_chunks()
        offs = pos_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = pos_col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        # hive partition values read back as strings/dictionaries: cast
        try:
            parts = pc.cast(
                pc.cast(batch["part"], pa.string()), pa.int64()
            ).to_numpy(zero_copy_only=False)
        except Exception:  # noqa: BLE001
            parts = batch["part"].to_numpy(zero_copy_only=False).astype(np.int64)

        npos = np.diff(offs)
        if (npos <= 0).any():
            j = int(np.argmax(npos <= 0))
            bad.append(
                ("positions_empty", f"{terms[j]!r}/doc={int(docs[j])}", "")
            )
        if vals.size and int(vals.min()) < 0:
            bad.append(("positions_negative", "store", f"min={vals.min()}"))
        # strictly ascending within each row: every in-row adjacent diff > 0
        if vals.size > 1:
            d = np.diff(vals)
            boundary = np.zeros(vals.size - 1, dtype=bool)
            inner = offs[1:-1] - 1
            boundary[inner[(inner >= 0) & (inner < vals.size - 1)]] = True
            viol = np.flatnonzero((d <= 0) & ~boundary)
            if viol.size:
                row = int(np.searchsorted(offs, viol[0], side="right") - 1)
                bad.append(
                    (
                        "positions_not_ascending",
                        f"{terms[row]!r}/doc={int(docs[row])}",
                        "",
                    )
                )
        # partition placement: recompute crc per UNIQUE term
        uniq = sorted(set(terms))
        expected = {t: stable_hash(t.encode()) % POS_PARTS for t in uniq}
        exp_arr = np.array([expected[t] for t in terms], dtype=np.int64)
        wrong = np.flatnonzero(exp_arr != parts)
        if wrong.size:
            j = int(wrong[0])
            bad.append(
                (
                    "positions_wrong_partition",
                    f"{terms[j]!r}",
                    f"part={int(parts[j])} expected={int(exp_arr[j])}",
                )
            )
        nf, np_ = len(bad), batch.num_rows
        return pa.table(
            {
                "kind": pa.array(["finding"] * nf + ["partial"] * np_),
                "check": pa.array(
                    [r[0] for r in bad] + [""] * np_, type=pa.string()
                ),
                "scope": pa.array(
                    [r[1] for r in bad] + [""] * np_, type=pa.string()
                ),
                "detail": pa.array(
                    [r[2] for r in bad] + [""] * np_, type=pa.string()
                ),
                "term": pa.concat_arrays(
                    [
                        pa.array([""] * nf, type=pa.string()),
                        batch["term"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "df_s": pa.concat_arrays(
                    [
                        pa.array([0] * nf, type=pa.int64()),
                        pa.array(np.ones(np_, dtype=np.int64)),
                    ]
                ),
                "cf_s": pa.concat_arrays(
                    [
                        pa.array([0] * nf, type=pa.int64()),
                        pa.array(npos.astype(np.int64)),
                    ]
                ),
            }
        )


def check_positions(
    pos_dir: str, index_dir: str | None = None, concurrency=(1, 8)
) -> pa.Table:
    """Validate a positional store (ciff_ray.positions): per-row
    structure + partition placement, and — when the matching frequency
    index is given — a signed per-term cross-check: the store's
    (row count, Σ positions) per term must equal the index's (df, cf).
    The cross-check is skipped for analyzed (e.g. Porter) indexes: the
    positional store indexes raw tokens, so the vocabularies differ by
    design."""
    import pyarrow.compute as pc

    findings: list[tuple[str, str, str]] = []
    if not os.path.exists(os.path.join(pos_dir, "_DONE")):
        return _findings([("positions_done_marker", pos_dir, "missing")])

    mixed = ray.data.read_parquet(pos_dir, file_extensions=["parquet"]).map_batches(
        _PosChecker, batch_format="pyarrow", concurrency=concurrency
    ).materialize()

    def _only_findings(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["kind"], "finding")).select(
            ["check", "scope", "detail"]
        )

    for r in mixed.map_batches(_only_findings, batch_format="pyarrow").take_all():
        findings.append((r["check"], r["scope"], r["detail"]))

    if index_dir is not None:
        m = Manifest.read(IndexPaths(index_dir).manifest)
        if getattr(m, "analyzer", ""):
            return _findings(findings)  # vocabularies differ by design
        from ray.data.aggregate import Sum

        def _pos_side(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["kind"], "partial")).select(
                ["term", "df_s", "cf_s"]
            )

        def _neg_stats(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "term": t["term"],
                    "df_s": pc.multiply(t["df"], -1),
                    "cf_s": pc.multiply(t["cf"], -1),
                }
            )

        stats_side = ray.data.read_parquet(
            IndexPaths(index_dir).term_stats,
            file_extensions=["parquet"],
            columns=["term", "df", "cf"],
        ).map_batches(_neg_stats, batch_format="pyarrow")

        def _nonzero(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.or_(pc.not_equal(t["df_d"], 0), pc.not_equal(t["cf_d"], 0))
            )

        residue = (
            mixed.map_batches(_pos_side, batch_format="pyarrow")
            .union(stats_side)
            .groupby("term")
            .aggregate(
                Sum("df_s", alias_name="df_d"), Sum("cf_s", alias_name="cf_d")
            )
            .map_batches(_nonzero, batch_format="pyarrow")
            .take_all()
        )
        for r in residue:
            findings.append(
                ("positions_index_mismatch", repr(r["term"]),
                 f"df_delta={r['df_d']} cf_delta={r['cf_d']}")
            )
    return _findings(findings)


# ---------------------------------------------------------------------------
# pruned index (ciff_ray.pruned) — tau-bound soundness audit


class _PostingContribEmitter:
    """Full-index segment slices → tagged (term, kind=0, doc, contrib)
    rows, with contrib recomputed EXACTLY as pruned.py computes it
    (same int64-tf expression, same manifest constants), so the tau
    comparison below is bit-exact."""

    def __init__(self, index_dir: str) -> None:
        paths = IndexPaths(index_dir)
        m = Manifest.read(paths.manifest)
        self._k1, self._b = m.k1, m.b
        self._avgdl = m.average_doclength
        self._dl = DoclengthStore(paths.docmap_dir, m.num_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
        tcodec = batch["tf_codec"].to_numpy(zero_copy_only=False)
        t_out: list[str] = []
        d_out: list[np.ndarray] = []
        v_out: list[np.ndarray] = []
        reps: list[int] = []
        for i, term in enumerate(terms):
            df = int(dfs[i])
            gaps = codecs.decode(
                batch["doc_bytes"][i].as_py(), df - 1, int(dcodec[i])
            ).astype(np.int64)
            docs = np.empty(df, dtype=np.int64)
            docs[0] = int(firsts[i])
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += docs[0]
            tfs = codecs.decode(
                batch["tf_bytes"][i].as_py(), df, int(tcodec[i])
            ).astype(np.int64)
            dl = self._dl[docs].astype(np.int64)
            contrib = tfs * (self._k1 + 1.0) / (
                tfs
                + self._k1
                * (1.0 - self._b + self._b * dl.astype(np.float64) / self._avgdl)
            )
            t_out.append(term)
            reps.append(df)
            d_out.append(docs)
            v_out.append(contrib)
        if not t_out:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "kind": pa.array([], type=pa.int8()),
                    "doc": pa.array([], type=pa.int64()),
                    "val": pa.array([], type=pa.float64()),
                }
            )
        n = sum(reps)
        return pa.table(
            {
                "term": pa.array(np.repeat(np.array(t_out, dtype=object), reps)),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "doc": pa.array(np.concatenate(d_out), type=pa.int64()),
                "val": pa.array(np.concatenate(v_out), type=pa.float64()),
            }
        )


def _pruned_docs_emitter(batch: pa.Table) -> pa.Table:
    """Pruned-index segment slices → tagged (term, kind=1, doc, 0)."""
    terms = batch["term"].to_pylist()
    dfs = batch["df"].to_numpy(zero_copy_only=False)
    firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
    dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
    t_out, d_out, reps = [], [], []
    for i, term in enumerate(terms):
        df = int(dfs[i])
        gaps = codecs.decode(
            batch["doc_bytes"][i].as_py(), df - 1, int(dcodec[i])
        ).astype(np.int64)
        docs = np.empty(df, dtype=np.int64)
        docs[0] = int(firsts[i])
        if df > 1:
            np.cumsum(gaps, out=docs[1:])
            docs[1:] += docs[0]
        t_out.append(term)
        reps.append(df)
        d_out.append(docs)
    if not t_out:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "kind": pa.array([], type=pa.int8()),
                "doc": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.float64()),
            }
        )
    n = sum(reps)
    return pa.table(
        {
            "term": pa.array(np.repeat(np.array(t_out, dtype=object), reps)),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "doc": pa.array(np.concatenate(d_out), type=pa.int64()),
            "val": pa.array(np.zeros(n, dtype=np.float64)),
        }
    )


def _check_pruned_group(g: pa.Table) -> pa.Table:
    """One term's tagged rows → tau-soundness findings.  Invariants:
    pruned postings ⊆ full postings; every full posting ABSENT from the
    pruned list has contribution ≤ tau (kind=2 row from prune_meta);
    a term with absent postings must carry a tau row at all."""
    term = g["term"][0].as_py()
    kinds = g["kind"].to_numpy(zero_copy_only=False)
    docs = g["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = g["val"].to_numpy(zero_copy_only=False)
    full_d = docs[kinds == 0]
    full_v = vals[kinds == 0]
    pruned_d = np.sort(docs[kinds == 1])
    taus = vals[kinds == 2]
    bad: list[tuple[str, str, str]] = []
    # pruned ⊆ full
    pos = np.searchsorted(np.sort(full_d), pruned_d)
    fsort = np.sort(full_d)
    ghost = (pos >= fsort.size) | (
        fsort[np.minimum(pos, fsort.size - 1)] != pruned_d
    )
    if ghost.any():
        bad.append(
            ("pruned_ghost_posting", repr(term),
             f"{int(ghost.sum())} pruned docs not in full index")
        )
    # absent full postings must be bounded by tau
    pos = np.searchsorted(pruned_d, full_d)
    present = (pos < pruned_d.size) & (
        pruned_d[np.minimum(pos, pruned_d.size - 1)] == full_d
    )
    absent_v = full_v[~present]
    if absent_v.size:
        if taus.size == 0:
            bad.append(
                ("pruned_missing_tau", repr(term),
                 f"{absent_v.size} postings pruned but no tau recorded")
            )
        else:
            tau = float(taus.max())
            over = absent_v > tau
            if over.any():
                bad.append(
                    ("tau_bound_violation", repr(term),
                     f"max pruned contrib {absent_v.max()} > tau {tau}")
                )
    return _findings(bad)


def check_pruned(
    pruned_dir: str, full_dir: str, concurrency=(1, 8)
) -> pa.Table:
    """Audit a statically pruned index (ciff_ray.pruned) against its
    source: TieredEngine's certificate is sound ONLY if every
    pruned-away posting's contribution is ≤ the term's recorded tau —
    this check recomputes all contributions from the FULL index and
    verifies that bound term by term (tagged three-way union → one
    groupby(term)).  Cost is a full postings decode + vocabulary
    shuffle: an audit pass, not a serving-path cost."""
    meta_path = os.path.join(pruned_dir, "prune_meta.parquet")
    if not os.path.exists(meta_path):
        return _findings([("prune_meta", pruned_dir, "missing")])

    full_rows = ray.data.read_parquet(
        IndexPaths(full_dir).segments_dir,
        file_extensions=["parquet"],
        columns=["term", "df", "first_doc", "doc_codec", "tf_codec",
                 "doc_bytes", "tf_bytes"],
    ).map_batches(
        _PostingContribEmitter,
        fn_constructor_args=(full_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pruned_rows = ray.data.read_parquet(
        IndexPaths(pruned_dir).segments_dir,
        file_extensions=["parquet"],
        columns=["term", "df", "first_doc", "doc_codec", "tf_codec",
                 "doc_bytes", "tf_bytes"],
    ).map_batches(_pruned_docs_emitter, batch_format="pyarrow")
    meta = pq.read_table(meta_path)
    meta_rows = ray.data.from_arrow(
        pa.table(
            {
                "term": meta["term"],
                "kind": pa.array(
                    np.full(meta.num_rows, 2, dtype=np.int8)
                ),
                "doc": pa.array(
                    np.full(meta.num_rows, -1, dtype=np.int64)
                ),
                "val": meta["tau"].combine_chunks().cast(pa.float64()),
            }
        )
    )
    out = (
        full_rows.union(pruned_rows)
        .union(meta_rows)
        .groupby("term")
        .map_groups(_check_pruned_group, batch_format="pyarrow")
        .take_all()
    )
    return _findings([(r["check"], r["scope"], r["detail"]) for r in out])


# ---------------------------------------------------------------------------
# doc-norms store (ciff_ray.tfidf) — density + energy audit


@ray.remote
def _norm_energy_partition(index_dir: str, pid: int) -> float:
    """Σ over this partition's postings of ((1+ln tf) · ln(N/df_t))² —
    the index-side half of the norms energy identity (Σ_d norm_d² over
    the store must equal this summed over every partition, because each
    posting contributes exactly once to exactly one doc's norm)."""
    import pyarrow.parquet as pq

    from ciff_ray import codecs
    from ciff_ray.query import LocalScorer

    pa.set_cpu_count(1)
    scorer = LocalScorer(index_dir)
    seg_path = IndexPaths(index_dir).segment(pid)
    if not os.path.exists(seg_path):
        return 0.0
    seg = pq.read_table(
        seg_path, columns=["term", "df", "tf_bytes", "tf_codec"]
    )
    n_docs = float(scorer.N)
    total = 0.0
    terms_py = seg["term"].to_pylist()
    dfs = seg["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    tcodec = seg["tf_codec"].to_numpy(zero_copy_only=False)
    tf_bufs = seg["tf_bytes"].to_pylist()
    for i in range(seg.num_rows):
        tfs = codecs.decode(tf_bufs[i], int(dfs[i]), int(tcodec[i]))
        st = scorer._term_stat(terms_py[i])
        w = (1.0 + np.log(tfs.astype(np.float64))) * np.log(
            n_docs / float(st[0])
        )
        total += float((w * w).sum())
    return total


def check_norms(
    norms_dir: str, index_dir: str, concurrency=(1, 8), rel_tol: float = 1e-9
) -> pa.Table:
    """Validate a doc-norms store (ciff_ray.tfidf) against its index:

    * `_DONE` marker present; doc_id moments match the dense 0..N−1
      invariant (count / min / max / Σ / Σ² — the docmap device);
      every norm ≥ 0 and finite
    * energy identity: Σ norm² over the store == Σ over ALL index
      postings of ((1+ln tf)·ln(N/df))², each side summed
      distributedly; compared under `rel_tol` (the two sides sum the
      same multiset of doubles in different orders)

    Skipped (marker finding) for analyzed indexes — norms are defined
    over raw tokens, an analyzed vocabulary differs by design."""
    from ray.data.aggregate import Max, Min, Sum

    findings: list[tuple[str, str, str]] = []
    if not os.path.exists(os.path.join(norms_dir, "_DONE")):
        return _findings([("norms_done_marker", norms_dir, "missing")])
    m = Manifest.read(IndexPaths(index_dir).manifest)
    n = m.num_docs

    def _moments(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["norm"].to_numpy(zero_copy_only=False).astype(np.float64)
        bad = int((~np.isfinite(v)).sum() + (v < 0).sum())
        return pa.table(
            {
                "cnt": pa.array([len(d)], type=pa.int64()),
                "dmin": pa.array(
                    [int(d.min()) if d.size else 0], type=pa.int64()
                ),
                "dmax": pa.array(
                    [int(d.max()) if d.size else 0], type=pa.int64()
                ),
                "dsum": pa.array([int(d.sum())], type=pa.int64()),
                "dsq": pa.array([int((d * d).sum())], type=pa.int64()),
                "bad": pa.array([bad], type=pa.int64()),
                "energy": pa.array(
                    [float((v * v).sum())], type=pa.float64()
                ),
            }
        )

    agg = (
        ray.data.read_parquet(norms_dir, file_extensions=["parquet"])
        .map_batches(_moments, batch_format="pyarrow")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Min("dmin", alias_name="dmin"),
            Max("dmax", alias_name="dmax"),
            Sum("dsum", alias_name="dsum"),
            Sum("dsq", alias_name="dsq"),
            Sum("bad", alias_name="bad"),
            Sum("energy", alias_name="energy"),
        )
    )
    if agg["cnt"] != n:
        findings.append(
            ("norms_row_count", norms_dir, f"{agg['cnt']} rows for {n} docs")
        )
    exp_sum = n * (n - 1) // 2
    exp_sq = (n - 1) * n * (2 * n - 1) // 6
    if n and (
        agg["dmin"] != 0
        or agg["dmax"] != n - 1
        or agg["dsum"] != exp_sum
        or agg["dsq"] != exp_sq
    ):
        findings.append(
            ("norms_docid_moments", norms_dir,
             f"min={agg['dmin']} max={agg['dmax']} sum={agg['dsum']} "
             f"sq={agg['dsq']} (dense 0..{n - 1} expected)")
        )
    if agg["bad"]:
        findings.append(
            ("norms_value_domain", norms_dir,
             f"{agg['bad']} negative/non-finite norms")
        )
    if getattr(m, "analyzer", ""):
        findings.append(
            ("norms_energy_skipped", index_dir,
             "analyzed index: raw-token norms are incomparable by design")
        )
        return _findings(findings)
    idx_energy = sum(
        ray.get(
            [
                _norm_energy_partition.remote(index_dir, pid)
                for pid in range(m.num_partitions)
            ]
        )
    )
    store_energy = float(agg["energy"])
    denom = max(abs(idx_energy), abs(store_energy), 1.0)
    if abs(idx_energy - store_energy) > rel_tol * denom:
        findings.append(
            ("norms_energy_mismatch", norms_dir,
             f"store={store_energy!r} index={idx_energy!r}")
        )
    return _findings(findings)


# ---------------------------------------------------------------------------
# reorder mapping store (ciff_ray.reorder) — permutation audit


def check_mapping(
    mapping_dir: str, num_docs: int, value_col: str = "old_id"
) -> pa.Table:
    """Validate a docid mapping store (ciff_ray.reorder): `_DONE`
    marker; doc_id moments match dense 0..N−1 (the docmap device); and
    the value column's moments also match dense 0..N−1 — count + min +
    max + Σ + Σ² together are sound (not adversarial-proof, same caveat
    as the docmap check) evidence of a permutation, with no driver-side
    N-array.  ``value_col="old_id"`` audits the forward (new->old)
    store, ``"new_id"`` the inverse (old->new) one."""
    from ray.data.aggregate import Max, Min, Sum

    findings: list[tuple[str, str, str]] = []
    if not os.path.exists(os.path.join(mapping_dir, "_DONE")):
        return _findings([("mapping_done_marker", mapping_dir, "missing")])

    def _moments(t: pa.Table) -> pa.Table:
        out = {}
        for col in ("doc_id", value_col):
            v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            out[f"{col}_min"] = [int(v.min()) if v.size else 0]
            out[f"{col}_max"] = [int(v.max()) if v.size else 0]
            out[f"{col}_sum"] = [int(v.sum())]
            out[f"{col}_sq"] = [int((v * v).sum())]
        out["cnt"] = [t.num_rows]
        return pa.table(
            {k: pa.array(vs, type=pa.int64()) for k, vs in out.items()}
        )

    aggs = [Sum("cnt", alias_name="cnt")]
    for col in ("doc_id", value_col):
        aggs += [
            Min(f"{col}_min", alias_name=f"{col}_min"),
            Max(f"{col}_max", alias_name=f"{col}_max"),
            Sum(f"{col}_sum", alias_name=f"{col}_sum"),
            Sum(f"{col}_sq", alias_name=f"{col}_sq"),
        ]
    agg = (
        ray.data.read_parquet(mapping_dir, file_extensions=["parquet"])
        .map_batches(_moments, batch_format="pyarrow")
        .aggregate(*aggs)
    )
    n = num_docs
    if agg["cnt"] != n:
        findings.append(
            ("mapping_row_count", mapping_dir, f"{agg['cnt']} rows for {n} docs")
        )
    exp_sum = n * (n - 1) // 2
    exp_sq = (n - 1) * n * (2 * n - 1) // 6
    for col in ("doc_id", value_col):
        if n and (
            agg[f"{col}_min"] != 0
            or agg[f"{col}_max"] != n - 1
            or agg[f"{col}_sum"] != exp_sum
            or agg[f"{col}_sq"] != exp_sq
        ):
            findings.append(
                (f"mapping_{col}_moments", mapping_dir,
                 f"min={agg[f'{col}_min']} max={agg[f'{col}_max']} "
                 f"sum={agg[f'{col}_sum']} sq={agg[f'{col}_sq']} "
                 f"(dense 0..{n - 1} expected)")
            )
    return _findings(findings)


def check_mapping_pair(
    mapping_dir: str, inv_dir: str, num_docs: int, sample: int = 1024
) -> pa.Table:
    """Audit a forward (new->old) + inverse (old->new) mapping store
    PAIR: per-store permutation moments (check_mapping both ways), then
    a deterministic O(sample) round-trip — new -> old -> new must be
    the identity on an evenly spaced id sample.  The sample goes
    through the same doc-range-sharded gathers serving uses, so it also
    exercises row-group pruning; sample size, not N, bounds driver
    memory."""
    from ciff_ray.reorder import NewIdStore, OldIdStore

    findings = pa.concat_tables(
        [
            check_mapping(mapping_dir, num_docs, value_col="old_id"),
            check_mapping(inv_dir, num_docs, value_col="new_id"),
        ]
    )
    if findings.num_rows or num_docs == 0:
        return findings
    ids = np.unique(
        np.linspace(0, num_docs - 1, num=min(sample, num_docs), dtype=np.int64)
    )
    old = OldIdStore(mapping_dir, num_docs).gather_sorted(ids)
    order = np.argsort(old)
    back = np.empty_like(old)
    back[order] = NewIdStore(inv_dir, num_docs).gather_sorted(old[order])
    bad = ids[back != ids]
    if bad.size:
        return pa.concat_tables(
            [
                findings,
                _findings(
                    [
                        (
                            "mapping_roundtrip",
                            f"{mapping_dir} <-> {inv_dir}",
                            f"{bad.size}/{ids.size} sampled ids broke "
                            f"new->old->new (first: {int(bad[0])})",
                        )
                    ]
                ),
            ]
        )
    return findings
