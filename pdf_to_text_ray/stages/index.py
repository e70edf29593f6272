"""Distributed inverted index: token → posting-list parquet, sharded
by token hash, with pruned point lookups.

The search-engine-shaped sink the reference lacks (it stores whole
documents per key, src/main.ts:214-233): build once as a Ray Data
pipeline (explode → one shuffle on the shard key → partitioned
parquet), then serve term lookups by reading ONLY the shards the query
terms hash to — at 100 TB the read is |terms|/num_shards of the index,
not a scan.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import tokenize_ascii


def _shard_of(token: str, num_shards: int) -> int:
    import hashlib

    # stable across processes (pd.util.hash_array is too, but a doc'd
    # md5 keeps the lookup side trivially reimplementable)
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:4],
                          "little") % num_shards


def _shard_array(tokens, num_shards: int):
    import hashlib

    return [int.from_bytes(hashlib.md5(t.encode()).digest()[:4],
                           "little") % num_shards for t in tokens]


def build_inverted_index(ds, out_dir: str, *, key_col: str = "doc_id",
                         text_col: str = "text",
                         num_shards: int = 16) -> str:
    """Explode docs to distinct (token, doc) postings, shard by
    hash(token), write hive-partitioned parquet (one directory per
    shard → resumable + prunable). Returns ``out_dir``."""

    def explode(t: pa.Table) -> pa.Table:
        toks, ids = [], []
        for did, s in zip(t[key_col].to_pylist(), t[text_col].to_pylist()):
            for tok in set(tokenize_ascii(s or "")):
                toks.append(tok)
                ids.append(did)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            key_col: pa.array(ids, pa.int64()),
            "shard": pa.array(_shard_array(toks, num_shards), pa.int64()),
        })

    postings = ds.map_batches(explode, batch_format="pyarrow")
    postings.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir


def lookup_postings(index_dir: str, terms: list[str], *,
                    key_col: str = "doc_id",
                    num_shards: int = 16) -> pd.DataFrame:
    """Point lookup: read only the shard directories the query terms
    hash to, filter to the terms, return (token, key) sorted."""
    import ray.data as rd

    import glob as _glob

    shards = sorted({_shard_of(t, num_shards) for t in terms})
    # Ray's read_parquet wants files when given a multi-path list —
    # expand each pruned shard dir to its parquet files
    paths = [f for s in shards
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"shard={s}", "*.parquet")))]
    if not paths:
        return pd.DataFrame({"token": pd.Series([], dtype="str"),
                             key_col: pd.Series([], dtype="int64")})
    term_set = pa.array(sorted(set(terms)), pa.string())

    def keep(t: pa.Table) -> pa.Table:
        return (t.select(["token", key_col])
                .filter(pc.is_in(t["token"], value_set=term_set)))

    out = (rd.read_parquet(paths, columns=["token", key_col])
           .map_batches(keep, batch_format="pyarrow")
           .to_pandas())
    return (out.sort_values(["token", key_col])
            .reset_index(drop=True))
