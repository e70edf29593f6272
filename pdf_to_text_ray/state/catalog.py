"""Transactional catalog — atomic MULTI-TABLE snapshots over
``state/versioned.py`` tables (the Iceberg-catalog idea, reduced to
what a training pipeline needs): curation jobs commit to individual
tables continuously, but a training run pins ONE catalog version and
sees a CONSISTENT set of table versions — never table A's new commit
joined against table B's old one, and never a table commit that no
catalog publish has blessed.

- tables live under ``root/tables/<name>/`` (each its own versioned
  table with its own commit log);
- catalog publish = one line ``{version, pins: {table: version}}``
  appended to ``root/_catalog.json`` via atomic rename — the same
  crash contract as the table logs (a crashed publish is invisible,
  readers keep resolving the previous catalog version);
- ``publish()`` validates every pinned version against its table's
  own log BEFORE the append, so a catalog can never reference an
  orphan or unwritten commit.
"""

from __future__ import annotations

import json
import os

from .versioned import latest_version, read_as_of

_CATALOG = "_catalog.json"


def table_root(root: str, table: str) -> str:
    return os.path.join(root, "tables", table)


def _read_catalog(root: str) -> list[dict]:
    path = os.path.join(root, _CATALOG)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def latest_catalog_version(root: str) -> int:
    return max((e["version"] for e in _read_catalog(root)), default=0)


def publish(root: str, pins: dict[str, int]) -> int:
    """Atomically publish a catalog version pinning each table to a
    specific committed version. Raises if any pin references a version
    its table's log does not contain."""
    for table, v in pins.items():
        have = latest_version(table_root(root, table))
        if not (1 <= v <= have):
            raise ValueError(
                f"cannot pin {table!r} at v{v}: table log has {have} "
                "commit(s)")
    log = _read_catalog(root)
    version = latest_catalog_version(root) + 1
    log.append({"version": version, "pins": dict(pins)})
    tmp = os.path.join(root, _CATALOG + ".tmp")
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, os.path.join(root, _CATALOG))
    return version


def pins_as_of(root: str, catalog_version: int) -> dict[str, int]:
    for e in _read_catalog(root):
        if e["version"] == catalog_version:
            return dict(e["pins"])
    raise ValueError(f"no catalog version {catalog_version}")


def read_table(root: str, catalog_version: int, table: str, *,
               key: str, num_buckets: int = 16):
    """Dataset of ``table``'s state as pinned by ``catalog_version`` —
    unpinned later table commits are invisible, by construction."""
    pins = pins_as_of(root, catalog_version)
    if table not in pins:
        raise ValueError(
            f"catalog v{catalog_version} does not pin table {table!r}")
    return read_as_of(table_root(root, table), pins[table], key=key,
                      num_buckets=num_buckets)
