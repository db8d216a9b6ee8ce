"""BP document ordering — recursive graph bisection over the
(term, doc) bipartite graph (Dhulipala, Kabiljo, Karrer, Ottaviano,
Pupyrev, Shalita: "Compressing Graphs and Indexes with Recursive Graph
Bisection", KDD 2016; the PISA ecosystem's standard docID-reorder for
2-3× d-gap compression wins on real text).  Public-paper algorithm
only; the reference carries the permutation REPAIR machinery this
feeds (/root/reference/src/binary_collection.rs:384-397).

Output contract: :func:`bp_keys` maps a (doc_id, text) Dataset to a
slim key Dataset ``(doc_id, bucket, pos)``; sorting by
``(bucket, pos, doc_id)`` IS the BP order (reorder.py consumes it via
the ORDERINGS hook).

Distribution shape — and its stated partitioning assumption:

* one stateless ``map_batches`` pass builds the slim forward index
  (doc_id, simhash, unique term-hash list) — tokenization happens
  exactly once;
* when the corpus exceeds ``cap`` docs, the TOP bisection levels are
  a similarity-prefix split: bucket = the high ``levels`` bits of the
  64-bit SimHash.  Like the first rounds of gain-driven bisection,
  this puts textually-similar docs in the same half — without the
  all-to-all gain iteration, which at the top level would shuffle
  per-(term, side) degree tables of full-vocabulary size per
  iteration.  (Mackenzie et al. 2021 report the same
  shard-then-bisect compromise costs little compression in practice.)
* each bucket is then bisected EXACTLY and recursively inside one
  ``groupby("bucket").map_groups`` task — buckets run in parallel
  across the cluster, and every level below the prefix split is
  true gain-iterated BP.  ASSUMPTION (documented contract): one
  bucket's forward-index slice fits a worker's heap — ``cap`` docs
  at ~1 KB of CSR per doc ≈ 256 MB with the default cap of 2^18.
  At 10^12 docs that means ~4M buckets, each an independent task.

Inside a bucket everything is vectorized numpy over a CSR forward
index: per-term degree tables via ``np.bincount`` on the halves,
move gains via the standard Δ-cost formula evaluated per TERM and
segment-summed per doc with ``np.add.reduceat``, swaps by sorting
both halves' gains descending and exchanging while the pair-sum is
positive (the paper's swap rule).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.extras.dedup import SIMHASH_BITS

# bisection stops at ranges this small (paper uses O(10); the tail of
# the recursion contributes little and costs log-depth)
LEAF_SIZE = 24
# gain-swap iterations per level (paper: ~20, converges much earlier)
MAX_ITERS = 20
# docs per leaf bucket of the distributed split — one map_groups task
BP_CAP = 1 << 18


def _forward_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, simhash, terms:list<uint64>), terms
    UNIQUE per doc (BP degrees are binary).  One tokenizer pass (the
    SHARED extras.dedup kernels — same term hashes and bit votes, so
    the BP split can never drift from the simhash order) feeds both
    the simhash (coarse split key) and the CSR term lists."""
    from ciff_ray.extras.dedup import simhash_from_tf, term_hash_rows

    rows, h64, w, n = term_hash_rows(batch)
    simhash = simhash_from_tf(rows, h64, w, n)

    # CSR: rows are already one entry per (doc, term) — group by row
    order = np.argsort(rows, kind="stable")
    counts = np.bincount(rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(simhash.view(np.int64), type=pa.int64()),
            "terms": pa.LargeListArray.from_arrays(
                pa.array(offsets),
                pa.array(h64[order].view(np.int64), type=pa.int64()),
            ),
        }
    )


def _move_gains(
    csr_terms: np.ndarray,
    indptr: np.ndarray,
    side_docs: np.ndarray,
    deg_self: np.ndarray,
    deg_other: np.ndarray,
    n_self: int,
    n_other: int,
) -> np.ndarray:
    """Gain of moving each doc of one half to the other.  Evaluated
    per TERM over the half's gathered CSR slice, segment-summed per
    doc.  cost(d1,d2) = d1·log2(n1/(d1+1)) + d2·log2(n2/(d2+1));
    gain = cost(before) − cost(after move)."""
    lens = indptr[side_docs + 1] - indptr[side_docs]
    if lens.sum() == 0:
        return np.zeros(side_docs.size)
    t = csr_terms[_gather_ranges(indptr, side_docs)]
    d1 = deg_self[t].astype(np.float64)
    d2 = deg_other[t].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        before = d1 * np.log2(n_self / (d1 + 1)) + d2 * np.log2(
            n_other / (d2 + 1)
        )
        after = (d1 - 1) * np.log2(n_self / np.maximum(d1, 1)) + (
            d2 + 1
        ) * np.log2(n_other / (d2 + 2))
    g = before - after
    bounds = np.zeros(side_docs.size + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    out = np.add.reduceat(
        np.concatenate([g, [0.0]]), np.minimum(bounds[:-1], g.size)
    )
    out[lens == 0] = 0.0
    return out


def _gather_ranges(indptr: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of CSR ranges indptr[d]..indptr[d+1]."""
    lens = (indptr[docs + 1] - indptr[docs]).astype(np.int64)
    total = int(lens.sum())
    out = np.ones(total, dtype=np.int64)
    bounds = np.zeros(docs.size + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    nz = lens > 0
    starts = bounds[:-1][nz]
    out[starts] = indptr[docs[nz]]
    out[starts[1:]] -= indptr[docs[nz][:-1] + 1] - 1
    return np.cumsum(out)


def _local_bp(group: pa.Table) -> pa.Table:
    """Exact recursive bisection of one bucket (vectorized numpy).
    Returns (doc_id, bucket, pos) — pos is the doc's position in the
    BP order within the bucket."""
    n = group.num_rows
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False)
    bucket = group["bucket"][0].as_py() if n else 0
    if n <= 1:
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "bucket": pa.array(np.full(n, bucket), type=pa.int64()),
                "pos": pa.array(np.arange(n), type=pa.int64()),
            }
        )
    terms_col = group["terms"].combine_chunks()
    flat = terms_col.values.to_numpy(zero_copy_only=False).view(np.uint64)
    indptr = terms_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # densify term ids for bincount-able degrees
    uniq, csr_terms = np.unique(flat, return_inverse=True)
    vocab = uniq.size

    order = np.arange(n, dtype=np.int64)
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        m = hi - lo
        if m <= LEAF_SIZE:
            continue
        mid = lo + m // 2
        for _ in range(MAX_ITERS):
            left, right = order[lo:mid], order[mid:hi]
            deg_l = np.bincount(
                csr_terms[_gather_ranges(indptr, left)], minlength=vocab
            )
            deg_r = np.bincount(
                csr_terms[_gather_ranges(indptr, right)], minlength=vocab
            )
            gl = _move_gains(
                csr_terms, indptr, left, deg_l, deg_r, left.size, right.size
            )
            gr = _move_gains(
                csr_terms, indptr, right, deg_r, deg_l, right.size, left.size
            )
            ol = np.argsort(-gl, kind="stable")
            orr = np.argsort(-gr, kind="stable")
            k = min(ol.size, orr.size)
            pair = gl[ol[:k]] + gr[orr[:k]]
            nswap = int(np.searchsorted(-pair, 0, side="left"))
            if nswap == 0:
                break
            li, ri = ol[:nswap], orr[:nswap]
            tmp = left[li].copy()
            order[lo:mid][li] = right[ri]
            order[mid:hi][ri] = tmp
        stack.append((lo, mid))
        stack.append((mid, hi))

    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "bucket": pa.array(np.full(n, bucket), type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )


# low bits of the final bucket key reserved for splitting oversized
# prefix buckets; bucket keys are (prefix << SALT_BITS) | salt
SALT_BITS = 20


def bp_keys(docs: ray.data.Dataset, cap: int = BP_CAP) -> ray.data.Dataset:
    """(doc_id, text) Dataset -> BP key Dataset (doc_id, bucket, pos).

    The prefix split alone does NOT bound bucket size: SimHash gives
    near-duplicate docs IDENTICAL signatures, so on the template-heavy
    corpora BP targets, one prefix can swallow far more than ``cap``
    docs.  A slim per-bucket count (groupby on 16-byte rows) finds the
    oversized prefixes, and their docs are split into ceil(count/cap)
    salted sub-buckets by hashed doc_id — sub-buckets of one prefix
    keep ADJACENT final keys, so mutually-similar docs still land in
    one contiguous docid range and the d-gap win survives the split.
    Driver footprint: one count() scalar + one (bucket, n_salts) row
    per OVERSIZED prefix (each holds > cap docs, so there are at most
    num_docs/cap of them)."""
    n = docs.count()
    levels = 0
    while (n >> levels) > cap:
        levels += 1
    if levels + SALT_BITS > 62:
        raise ValueError(f"prefix split too deep: {levels} levels")

    def _bucketize(t: pa.Table) -> pa.Table:
        sim = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = (sim >> np.uint64(SIMHASH_BITS - levels)) if levels else np.zeros(
            len(t), dtype=np.uint64
        )
        return t.set_column(
            t.schema.get_field_index("simhash"),
            "bucket",
            pa.array(b.astype(np.int64)),
        )

    # materialize ONCE: the audit below consumes fwd, and without the
    # pin Ray Data would re-execute the tokenize+SimHash lineage for
    # the salt/BP pass (the docstring's "tokenization happens exactly
    # once" contract)
    fwd = docs.map_batches(_forward_batch, batch_format="pyarrow").map_batches(
        _bucketize, batch_format="pyarrow"
    ).materialize()

    # bucket-size audit over slim (bucket) rows — column-pruned so the
    # count shuffle moves 8 bytes/doc, never the ~1KB/doc CSR column;
    # only oversized prefixes cross the driver
    counts = fwd.select_columns(["bucket"]).groupby("bucket").count()
    over: dict[int, int] = {}
    for t in counts.iter_batches(batch_format="pyarrow"):
        b = t["bucket"].to_numpy(zero_copy_only=False)
        c = t["count()"].to_numpy(zero_copy_only=False)
        big = c > cap
        for bk, ck in zip(b[big].tolist(), c[big].tolist()):
            over[bk] = -(-ck // cap)
    if over and max(over.values()) >= (1 << SALT_BITS):
        raise ValueError("oversized bucket needs more than 2^20 salts")

    import ray as _ray

    over_ref = _ray.put(over)

    class _Salt:
        """Final bucket key: (prefix << SALT_BITS) | salt.  salt = 0
        unless the prefix is oversized, then hashed-doc_id modulo its
        salt count (loaded once per actor from the broadcast dict)."""

        def __init__(self, over_ref):
            ov = _ray.get(over_ref)
            self.keys = np.array(sorted(ov), dtype=np.int64)
            self.nsalts = np.array(
                [ov[k] for k in sorted(ov)], dtype=np.int64
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            from ciff_ray.query import sorted_member

            b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
            salt = np.zeros(len(t), dtype=np.int64)
            hit = sorted_member(self.keys, b)
            if hit.any():
                d = t["doc_id"].to_numpy(zero_copy_only=False).astype(
                    np.uint64
                )
                mixed = (d[hit] * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
                salt[hit] = (
                    mixed
                    % self.nsalts[np.searchsorted(self.keys, b[hit])].astype(
                        np.uint64
                    )
                ).astype(np.int64)
            return t.set_column(
                t.schema.get_field_index("bucket"),
                "bucket",
                pa.array((b << SALT_BITS) | salt),
            )

    fwd = fwd.map_batches(
        _Salt,
        fn_constructor_args=(over_ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return fwd.groupby("bucket").map_groups(_local_bp, batch_format="pyarrow")
