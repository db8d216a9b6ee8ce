"""Versioned index catalog: atomic publish + pinned reads.

The production reindex story: builders write a NEW index directory
(they never mutate a served one — build.py's done-markers make the dir
immutable once complete), then `publish()` registers it as the next
generation and atomically swaps the catalog's CURRENT pointer.  Readers
resolve CURRENT once at open time and stay PINNED to that generation's
directory for their lifetime — a publish never changes the files under
an open engine, so queries are consistent across the swap with zero
downtime.  Old generations stay on disk until `prune()` (readers may
still hold them).

Concurrency: generation numbers are claimed with O_EXCL marker files
(two racing publishers get distinct generations), and the CURRENT swap
is a compare-and-swap loop over an atomic os.replace — a stale
publisher can never roll CURRENT backwards.  All files live under the
catalog dir, which on a cluster sits on shared storage (same
requirement as every index root — see README "Running on a cluster").
"""

from __future__ import annotations

import json
import os


def _current_path(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, "CURRENT")


def _gen_path(catalog_dir: str, gen: int) -> str:
    return os.path.join(catalog_dir, f"gen-{gen:06d}.json")


def current(catalog_dir: str) -> tuple[int, str] | None:
    """(generation, index_dir) of CURRENT, or None if never published."""
    try:
        with open(_current_path(catalog_dir)) as f:
            d = json.load(f)
        return int(d["gen"]), d["index_dir"]
    except FileNotFoundError:
        return None


def publish(catalog_dir: str, index_dir: str) -> int:
    """Register `index_dir` as the next generation and swap CURRENT to
    it.  Returns the generation number.  Safe under concurrent
    publishers; CURRENT never moves backwards."""
    os.makedirs(catalog_dir, exist_ok=True)
    index_dir = os.path.abspath(index_dir)
    # the manifest is the completeness witness: refuse to publish a
    # half-built directory
    manifest = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest):
        raise FileNotFoundError(f"not a completed index (no manifest): {index_dir}")

    cur = current(catalog_dir)
    gen = (cur[0] if cur else 0) + 1
    while True:  # claim a generation number exclusively
        try:
            fd = os.open(
                _gen_path(catalog_dir, gen), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
            break
        except FileExistsError:
            gen += 1
    with os.fdopen(fd, "w") as f:
        json.dump({"gen": gen, "index_dir": index_dir}, f)

    # compare-and-swap CURRENT: only advance, never regress
    tmp = _current_path(catalog_dir) + f".tmp.{gen}"
    while True:
        cur = current(catalog_dir)
        if cur is not None and cur[0] >= gen:
            return gen  # a newer publish already won
        with open(tmp, "w") as f:
            json.dump({"gen": gen, "index_dir": index_dir}, f)
        os.replace(tmp, _current_path(catalog_dir))
        chk = current(catalog_dir)
        if chk is not None and chk[0] >= gen:
            return gen


def generations(catalog_dir: str) -> list[tuple[int, str]]:
    """All published (generation, index_dir), ascending."""
    out = []
    try:
        names = os.listdir(catalog_dir)
    except FileNotFoundError:
        return out
    for n in sorted(names):
        if n.startswith("gen-") and n.endswith(".json"):
            with open(os.path.join(catalog_dir, n)) as f:
                d = json.load(f)
            out.append((int(d["gen"]), d["index_dir"]))
    return out


def open_current(catalog_dir: str, **engine_kwargs):
    """QueryEngine pinned to the CURRENT generation at call time; later
    publishes do not affect the returned engine."""
    from ciff_ray.query import QueryEngine

    cur = current(catalog_dir)
    if cur is None:
        raise FileNotFoundError(f"catalog {catalog_dir} has no CURRENT")
    return QueryEngine(cur[1], **engine_kwargs)


def prune(catalog_dir: str, keep: int = 2) -> list[int]:
    """Drop catalog REGISTRATIONS of all but the newest `keep`
    generations (never deletes index data — directory removal is the
    operator's call once no reader can hold the generation).  Returns
    the pruned generation numbers."""
    gens = generations(catalog_dir)
    pruned = []
    for gen, _ in gens[: max(0, len(gens) - keep)]:
        os.remove(_gen_path(catalog_dir, gen))
        pruned.append(gen)
    return pruned
