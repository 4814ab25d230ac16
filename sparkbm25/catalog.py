"""Snapshot catalog — atomic manifest publish with compare-and-swap.

The manifest is the index's commit point (the analog of an Iceberg table's
snapshot pointer; the reference's job store plays the same role,
app/storage/memory.py:22-169). Multi-driver arbitration needs the publish
to be a CAS on the claim token: "write this manifest IF the current
submit_token is still mine". POSIX rename alone cannot express that —
round 4 shipped a settle-window approximation whose verify-then-write gate
still had a race (a competitor claiming between the verify and the write
was clobbered back; ADVICE r04).

This module makes the publish pluggable:

- ``FlockCasCatalog`` (default): the read-compare-write runs under an
  ``flock(2)`` on a persistent sidecar guard, making the CAS genuinely
  atomic for every driver that can see the same filesystem locks (single
  host, or a cluster FS with working flock). No settle window, no
  verify/write gap.
- ``RenameCatalog``: plain atomic-rename publish with verify-before-write
  — the best available on stores without lock primitives (NFS without
  lockd); keeps the documented settle-window semantics, so deployments on
  such stores should arbitrate through a real catalog commit instead.
- An Iceberg-backed implementation would commit the manifest as a table
  snapshot via the catalog's conditional commit; the runtime jar is absent
  from this environment (probed every round), so the protocol boundary is
  the deliverable: ``build_index`` already routes every claim/publish
  through ``get_catalog()``.

Select with ``SPARKBM25_CATALOG=flock|rename`` (default flock).
"""

from __future__ import annotations

import json
import os
from typing import Protocol

MANIFEST = "manifest.json"


class CasConflict(RuntimeError):
    """The manifest's submit_token changed — another driver owns the
    artifact; the caller must abort without publishing."""


def _read(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write(index_dir: str, m: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, default=str)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))  # atomic rename


class SnapshotCatalog(Protocol):
    #: True when publish() is a genuine linearizable CAS (no settle window
    #: needed after claiming)
    atomic: bool

    def read(self, index_dir: str) -> dict | None: ...

    def publish(
        self, index_dir: str, manifest: dict,
        expected_token: str | None = None,
    ) -> None: ...


class RenameCatalog:
    """Verify-then-rename publish. NOT a true CAS: a competitor landing
    between the verify and the rename is clobbered — callers must keep the
    settle-window re-verify after claiming (jobs._CAS_SETTLE_S)."""

    atomic = False

    def read(self, index_dir: str) -> dict | None:
        return _read(index_dir)

    def publish(self, index_dir: str, manifest: dict,
                expected_token: str | None = None) -> None:
        if expected_token is not None:
            cur = _read(index_dir)
            if cur is None or cur.get("submit_token") != expected_token:
                raise CasConflict(
                    f"submit_token changed on {index_dir} (rename catalog)"
                )
        _write(index_dir, manifest)


class FlockCasCatalog:
    """Read-compare-write under flock(2) on a persistent sidecar guard —
    a linearizable CAS for all drivers sharing the filesystem's lock
    domain. The guard file is never unlinked (deleting it while held would
    let a late opener lock a fresh inode and bypass the guard — same
    discipline as jobs._acquire_build_lock)."""

    atomic = True

    def read(self, index_dir: str) -> dict | None:
        return _read(index_dir)

    def publish(self, index_dir: str, manifest: dict,
                expected_token: str | None = None) -> None:
        import fcntl

        os.makedirs(index_dir, exist_ok=True)
        guard_path = os.path.join(index_dir, ".manifest.guard")
        with open(guard_path, "a") as guard:
            fcntl.flock(guard, fcntl.LOCK_EX)
            try:
                if expected_token is not None:
                    cur = _read(index_dir)
                    if (
                        cur is None
                        or cur.get("submit_token") != expected_token
                    ):
                        raise CasConflict(
                            f"submit_token changed on {index_dir}"
                        )
                _write(index_dir, manifest)
            finally:
                fcntl.flock(guard, fcntl.LOCK_UN)


_CATALOGS = {"flock": FlockCasCatalog, "rename": RenameCatalog}


def get_catalog() -> SnapshotCatalog:
    name = os.environ.get("SPARKBM25_CATALOG", "flock").lower()
    try:
        return _CATALOGS[name]()
    except KeyError:
        raise ValueError(
            f"unknown SPARKBM25_CATALOG {name!r}; options: "
            f"{sorted(_CATALOGS)}"
        ) from None
