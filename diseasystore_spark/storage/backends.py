"""Commit-metadata backends for the SCD2 feature store.

The store's commit protocol (``storage/scd2.py``) needs exactly one
storage primitive with strong semantics — PUT-IF-ABSENT of a small
immutable object — plus plain get/put/list/delete of other small
control objects (commit markers with embedded manifests, the retain
floor, advisory locks). Bulk parquet data is NOT routed through this
interface: Spark reads and writes it through its own Hadoop
FileSystem layer (``file://`` here, ``s3a://`` on a cluster), exactly
as Delta Lake separates its LogStore from the data plane.

Two implementations:

- :class:`LocalCommitBackend` — POSIX filesystem. Conditional put is
  ``os.link`` of a fully-written, fsynced temp file: the link either
  atomically creates the name with complete content already durable,
  or fails EEXIST. No rename anywhere on the commit path.
- :class:`MemoryCommitBackend` — an object-store double: a dict
  behind a lock, compare-and-set conditional put, NO hard links, NO
  rename, no directory semantics — the exact primitive surface of
  S3 ``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` / Azure ETag
  puts. Running the full store (and its concurrency suite) over this
  backend proves the commit protocol uses nothing an object store
  lacks. ``MemoryCommitBackend.shared(root)`` returns a process-wide
  instance per root so independent store objects see one another's
  commits, like independent clients of one bucket.

Design note (why the protocol is this small): the previous layout
needed a ``link_or_copy`` operation to carry unchanged month
partitions into each new version directory — O(all months) I/O per
commit and un-mappable to object stores (no links). The manifest
layout (see ``scd2.py``) removed it: unchanged months are carried
forward by REFERENCE inside the commit marker's manifest, so the
whole protocol reduces to small-object put/get/list/delete with one
conditional put. Reference parity: the reference delegates this to
database transactions (``R/DiseasystoreBase.R:145-156``).
"""

from __future__ import annotations

import os
import threading
import uuid
from typing import Protocol


class CommitBackend(Protocol):
    """Small-object control-plane storage. All paths are plain
    strings (the store passes filesystem-style paths; a cloud
    implementation would map them onto bucket keys 1:1)."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Create ``path`` with ``data`` iff it does not exist.
        False when another writer got there first. MUST be atomic:
        observers see either nothing or the complete object."""
        ...

    def get(self, path: str) -> bytes | None:
        """Read an object; None if absent."""
        ...

    def put(self, path: str, data: bytes) -> None:
        """Unconditional last-writer-wins put (native object-store
        PUT). Used for advisory control objects only (retain floor),
        never for version commits."""
        ...

    def list(self, prefix: str) -> list[str]:
        """Names of objects directly under ``prefix`` (one level,
        like an S3 LIST with '/' delimiter). Empty when absent."""
        ...

    def delete(self, path: str) -> None:
        """Delete an object; silently ignore absence."""
        ...


class LocalCommitBackend:
    """POSIX implementation. ``put_if_absent`` is the os.link trick
    (atomic create-if-absent with complete, durable content);
    ``put`` is tmp + ``os.replace`` (atomic overwrite — acceptable
    here because unconditional puts never decide a commit)."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def get(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def put(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def list(self, prefix: str) -> list[str]:
        try:
            return [
                e for e in os.listdir(prefix) if not e.endswith(".tmp")
            ]
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class MemoryCommitBackend:
    """In-memory object-store double: conditional put is a locked
    compare-and-set over a dict — no links, no renames, no directory
    tree. Everything the store's commit protocol does must be
    expressible against THIS surface, or it would not survive a move
    to S3/GCS/Azure."""

    _shared: dict[str, "MemoryCommitBackend"] = {}
    _shared_lock = threading.Lock()

    @classmethod
    def shared(cls, root: str) -> "MemoryCommitBackend":
        """Process-wide instance per store root — independent store
        objects (concurrent writers, readers) observe one another's
        commits, like clients of one bucket."""
        key = os.path.abspath(root)
        with cls._shared_lock:
            if key not in cls._shared:
                cls._shared[key] = cls()
            return cls._shared[key]

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _norm(path: str) -> str:
        return os.path.normpath(path)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        path = self._norm(path)
        with self._lock:
            if path in self._objects:
                return False
            self._objects[path] = bytes(data)
            return True

    def get(self, path: str) -> bytes | None:
        with self._lock:
            return self._objects.get(self._norm(path))

    def put(self, path: str, data: bytes) -> None:
        with self._lock:
            self._objects[self._norm(path)] = bytes(data)

    def list(self, prefix: str) -> list[str]:
        prefix = self._norm(prefix) + os.sep
        with self._lock:
            out = []
            for key in self._objects:
                if key.startswith(prefix):
                    rest = key[len(prefix):]
                    if os.sep not in rest:
                        out.append(rest)
            return sorted(out)

    def delete(self, path: str) -> None:
        with self._lock:
            self._objects.pop(self._norm(path), None)
