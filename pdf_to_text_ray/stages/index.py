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
    # single source of the shard formula: build and lookup sides must
    # agree byte-for-byte
    return [_shard_of(t, num_shards) for t in tokens]


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


# ── BM25 ranked retrieval ─────────────────────────────────────────────

def bm25_topk(ds, terms: list[str], *, id_col: str = "doc_id",
              text_col: str = "text", k1: float = 1.2, b: float = 0.75,
              topk: int = 20) -> pd.DataFrame:
    """BM25 (Robertson/Spärck Jones probabilistic idf, the +1 variant)
    top-k over space-separated docs for a small query.

    Two streaming passes, both payload-free on the exchange: (1) a
    one-row-per-block partial of (n_docs, Σdl, df per term) summed on
    the driver (|blocks| rows); (2) a broadcast-stats score pass with
    per-batch partial top-k and a |blocks|×topk driver merge — the
    knn_bruteforce shape. Arithmetic mirrors the SQL oracle
    operation-for-operation; ranking happens on the 2dp-rounded score
    so a last-ulp ln() difference can never flip the top-k cut."""
    import numpy as np
    import ray

    m = len(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n = 0
        sum_dl = 0
        df = [0] * m
        for s in texts:
            if not s:
                continue
            words = s.split(" ")
            n += 1
            sum_dl += len(words)
            for j, term in enumerate(terms):
                if term in words:
                    df[j] += 1
        cols = {"n": pa.array([n], pa.int64()),
                "sum_dl": pa.array([sum_dl], pa.int64())}
        for j in range(m):
            cols[f"df_{j}"] = pa.array([df[j]], pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if parts.empty or int(parts["n"].sum()) == 0:
        # empty corpus / all-empty texts: the SQL twin (which filters
        # coalesce(text,'') <> '') returns no rows
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    agg = parts.sum()
    n_docs = int(agg["n"])
    avgdl = float(agg["sum_dl"]) / n_docs
    idf = [float(np.log((n_docs - int(agg[f"df_{j}"]) + 0.5)
                        / (int(agg[f"df_{j}"]) + 0.5) + 1.0))
           for j in range(m)]
    stats_ref = ray.put((avgdl, idf))

    def score_partial(t: pa.Table) -> pa.Table:
        av, idfs = ray.get(stats_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_id: list[int] = []
        out_s: list[float] = []
        for did, s in zip(ids, t[text_col].to_pylist()):
            if not s:
                continue
            words = s.split(" ")
            dl = len(words)
            score = 0.0
            for j, term in enumerate(terms):
                tf = words.count(term)
                # identical op order to the SQL twin:
                # idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
                score += (idfs[j] * (tf * (k1 + 1.0))
                          / (tf + k1 * (1.0 - b + b * dl / av)))
            out_id.append(did)
            out_s.append(score)
        sc = np.asarray(out_s, dtype=np.float64)
        di = np.asarray(out_id, dtype=np.int64)
        # Rank on the ROUNDED score (2dp, half-away-from-zero like
        # DuckDB round): raw doubles differ from the oracle's in the
        # last ulp of ln(), which would flip the top-k cut; rounding
        # first makes the (score desc, id asc) order — and the cut —
        # deterministic on both sides.
        sc = np.floor(sc * 100.0 + 0.5) / 100.0
        order = np.lexsort((di, -sc))[:topk]
        return pa.table({id_col: pa.array(di[order]),
                         "score": pa.array(sc[order])})

    parts = (ds.map_batches(score_partial, batch_format="pyarrow")
             .to_pandas())
    parts = parts.sort_values(["score", id_col],
                              ascending=[False, True]).head(topk)
    return parts.reset_index(drop=True)
