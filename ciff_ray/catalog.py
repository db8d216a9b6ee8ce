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

Concurrency: generation markers are claimed with atomic os.link of a
fully-written temp file (two racing publishers get distinct
generations, and a marker is never observable half-written — a crashed
publisher leaves only a temp file, which generations() ignores).  The
CURRENT swap is serialized by an exclusive flock around
read-compare-replace, so a stale publisher can never roll CURRENT
backwards.  All files live under the catalog dir, which on a cluster
sits on shared storage (same requirement as every index root — see
README "Running on a cluster"; the lock file needs flock semantics,
which NFSv4 provides).
"""

from __future__ import annotations

import fcntl
import json
import os
import uuid
from contextlib import contextmanager


@contextmanager
def _swap_lock(catalog_dir: str):
    fd = os.open(os.path.join(catalog_dir, ".lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


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

    # claim a generation number: write the payload to a temp file FIRST,
    # then atomically os.link it into the marker name — the marker is
    # never observable empty/half-written, and a crash leaves only a
    # .tmp file that generations() ignores
    cur = current(catalog_dir)
    gen = (cur[0] if cur else 0) + 1
    tmp = os.path.join(catalog_dir, f".gen.tmp.{uuid.uuid4().hex}")
    while True:
        with open(tmp, "w") as f:
            json.dump({"gen": gen, "index_dir": index_dir}, f)
        try:
            os.link(tmp, _gen_path(catalog_dir, gen))
            os.remove(tmp)
            break
        except FileExistsError:
            gen += 1

    # advance CURRENT, never regress: the read-compare-replace is
    # serialized under an exclusive lock (a blind os.replace after an
    # unlocked check lets a stale publisher overwrite a newer CURRENT)
    swap = _current_path(catalog_dir) + f".swap.{gen}"
    with _swap_lock(catalog_dir):
        cur = current(catalog_dir)
        if cur is not None and cur[0] >= gen:
            return gen  # a newer publish already won
        with open(swap, "w") as f:
            json.dump({"gen": gen, "index_dir": index_dir}, f)
        os.replace(swap, _current_path(catalog_dir))
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
                d = json.load(f)  # markers are linked-in complete
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
