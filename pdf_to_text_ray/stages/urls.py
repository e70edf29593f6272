"""URL canonicalization — the crawl-curation primitive that collapses
syntactic URL variants (case, default ports, fragments, tracking
params, query-param order) to one canonical key before host-level
stats and exact URL dedup.

The reference keys artifacts by the raw request url (main.ts uses the
uploaded name verbatim); at crawl scale the same page arrives under
``HTTP://Example.com:80/a?utm_source=x&b=1`` and
``http://example.com/a?b=1`` — canonicalization is what makes
last-write-wins dedup (pipelines/extract.py) and per-host aggregation
(``domain_stats``, ``host_pagerank``) see them as one page.

Rules (RFC 3986 §6 normalization + common crawl practice, each
replayable in ANSI SQL so the op stays oracle-checkable):
  1. scheme and host lowercase
  2. default port dropped (``:80`` http, ``:443`` https)
  3. fragment dropped
  4. tracking params dropped (``utm_*``, ``gclid``, ``fbclid``)
  5. remaining query params sorted bytewise; empty query dropped
Path case and percent-escapes are left untouched — unreserved-escape
decoding is NOT applied because it cannot be replayed portably in SQL
and differs across crawler implementations. Rule 1 lowercases the
WHOLE authority component, userinfo included: RFC 3986 keeps userinfo
case-sensitive, but splitting it out cannot be replayed in one SQL
expression, and crawl pipelines drop credentialed URLs long before
dedup — the uniform rule is the deliberate, replayable choice.

Per-batch kernel: the regex split runs per row over Python strings
(URL grammar is not an Arrow kernel), but the batch loop is the only
Python loop — compiled patterns are module-level, output is rebuilt as
one Arrow array per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}
_TRACKING_RE = re.compile(r"^(?:utm_[^=]*|gclid|fbclid)(?:=|$)")


def canonicalize_url(url: str) -> str:
    """One URL → its canonical form; non-URL strings pass through
    unchanged (fail-safe: a malformed crawl url still gets a stable
    dedup key — itself)."""
    m = _URL_RE.match(url)
    if m is None:
        return url
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and host.endswith(default):
        host = host[: -len(default)]
    out = scheme + "://" + host + m.group("path")
    query = m.group("query")
    if query:
        params = sorted(
            p for p in query.split("&") if not _TRACKING_RE.match(p))
        if params:
            out += "?" + "&".join(params)
    return out


def canonicalize_batch(tbl: pa.Table, col: str = "url",
                       out: str = "url_canon") -> pa.Table:
    """map_batches kernel: append the canonical form of ``col``."""
    canon = pa.array(
        [None if u is None else canonicalize_url(u)
         for u in tbl[col].to_pylist()],
        pa.string())
    return tbl.append_column(out, canon)


class BlocklistFilter:
    """Stateful actor stage: flag pages whose (host, path) matches a
    robots.txt-style disallow list of ``(host, path_prefix)`` rules.

    The rule set is preprocessed ONCE per actor in ``__init__``
    (host → sorted prefix list), not per batch — pass the class to
    ``map_batches(BlocklistFilter, fn_constructor_kwargs=...,
    concurrency=N)``. At crawl scale the rule list (a few million
    rules for the full robots corpus) is broadcast via ``ray.put`` and
    handed to the constructor as an object ref; here it arrives as a
    plain list. Matching is vectorized per host group: one
    ``str.startswith`` pass per distinct (host, prefix) rule over only
    that host's rows — rules for absent hosts cost nothing."""

    def __init__(self, rules: list[tuple[str, str]]):
        import ray

        if isinstance(rules, ray.ObjectRef):  # broadcast handoff
            rules = ray.get(rules)
        by_host: dict[str, list[str]] = {}
        for host, prefix in rules:
            by_host.setdefault(host, []).append(prefix)
        self.by_host = {h: sorted(set(p)) for h, p in by_host.items()}

    def __call__(self, tbl: pa.Table, host_col: str = "host",
                 path_col: str = "path",
                 out: str = "blocked") -> pa.Table:
        import numpy as np
        import pandas as pd

        hosts = pd.Series(tbl[host_col].to_pylist(), dtype=object)
        paths = pd.Series(tbl[path_col].to_pylist(), dtype=object)
        blocked = np.zeros(len(hosts), dtype=bool)
        for host, prefixes in self.by_host.items():
            idx = (hosts == host).to_numpy()
            if not idx.any():
                continue
            sub = paths[idx]
            hit = np.zeros(len(sub), dtype=bool)
            for pre in prefixes:
                hit |= sub.str.startswith(pre, na=False).to_numpy()
            blocked[idx] = hit
        return tbl.append_column(out, pa.array(blocked, pa.bool_()))
