"""Index directory layout + manifest / lineage IO.

Analogue of the reference's path-derivation helpers
(PisaPaths::from_base_path, /root/reference/src/lib.rs:307-338) — but an
index here is a *directory* of Parquet segments plus JSON manifests, so
a failed build can resume per partition (SURVEY.md §4 checkpoint/resume;
the reference has none).
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import asdict, dataclass, field


def cache_root() -> str:
    """Root for derived stores written by map tasks and read back by
    the driver (IVF bucket partitions, cached pipeline indexes).  On a
    multi-node cluster this MUST be shared storage (NFS / fuse-mounted
    object store): workers on different nodes write part files under
    it and the driver lists them — a node-local path would silently
    scatter the store.  Configure via CIFF_RAY_CACHE_ROOT (read at
    call time so tests / operators can redirect it); the default is
    single-node-only."""
    return os.environ.get("CIFF_RAY_CACHE_ROOT", "/tmp/ciff_ray_cache")


@dataclass
class IndexPaths:
    root: str

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest.json")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage.jsonl")

    @property
    def segments_dir(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def term_dict_dir(self) -> str:
        return os.path.join(self.root, "term_dict")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")

    @property
    def docmap_dir(self) -> str:
        return os.path.join(self.root, "docmap")

    @property
    def tombstones(self) -> str:
        return os.path.join(self.root, "tombstones.parquet")

    def segment(self, pid: int) -> str:
        return os.path.join(self.segments_dir, f"part-{pid:05d}.parquet")

    def segment_done(self, pid: int) -> str:
        return os.path.join(self.segments_dir, f"part-{pid:05d}.done.json")

    def term_dict_part(self, pid: int) -> str:
        return os.path.join(self.term_dict_dir, f"part-{pid:05d}.parquet")

    def ensure_dirs(self) -> None:
        os.makedirs(self.segments_dir, exist_ok=True)
        os.makedirs(self.term_dict_dir, exist_ok=True)
        os.makedirs(self.docmap_dir, exist_ok=True)


@dataclass
class Manifest:
    """CIFF Header analogue (/root/reference/proto/common-index-format-v1.proto:10-34)
    plus build parameters needed to interpret the segments."""

    version: int = 1
    num_docs: int = 0
    num_postings_lists: int = 0
    total_terms_in_collection: int = 0
    average_doclength: float = 0.0
    description: str = ""
    num_partitions: int = 0
    k1: float = 0.9
    b: float = 0.4
    block_size: int = 128
    input_fingerprint: str = ""
    heavy_terms: dict = field(default_factory=dict)  # term -> num_salts
    # term analyzer name ("" = none); query terms are analyzed with the
    # SAME function so build and serve can never disagree
    analyzer: str = ""

    def write(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, path)

    @classmethod
    def read(cls, path: str) -> "Manifest":
        with open(path) as f:
            return cls(**json.load(f))


def append_lineage(path: str, rows: list[dict]) -> None:
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def read_lineage(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def stable_hash(data: bytes) -> int:
    """Version-stable 32-bit hash used for term -> partition routing.
    (crc32: identical across Python/pandas/numpy versions, unlike
    builtin hash or pd.util hashing.)"""
    return zlib.crc32(data) & 0xFFFFFFFF


def atomic_write_parquet(table, path: str, **kwargs) -> None:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, path)


def publish_dir(tmp: str, out_dir: str) -> str:
    """Atomically publish a store directory: write the ``_DONE`` marker
    INSIDE ``tmp`` (so out_dir is never marker-less), then one rename.

    Race/crash semantics: if ``out_dir`` already exists WITH a marker,
    another builder won the race — this builder's tmp is discarded.
    If it exists WITHOUT a marker (a crash left a partial dir there),
    the partial dir is removed and the rename retried, so a broken
    store self-heals instead of discarding every rebuild forever."""
    import shutil

    with open(os.path.join(tmp, "_DONE"), "w", encoding="utf-8") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, out_dir)
        return out_dir
    except OSError:
        pass
    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.rename(tmp, out_dir)
            return out_dir
        except OSError as e:
            # rename is IMPOSSIBLE (cross-device tmp, missing parent,
            # permissions) — surface it instead of deleting the only
            # copy of the just-built store and reporting success
            raise OSError(
                f"cannot publish {tmp} -> {out_dir}: {e}"
            ) from e
    # a COMPLETE store (with _DONE) won the race — discard ours
    shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
