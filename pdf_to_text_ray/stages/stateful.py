"""The raw-actor escape hatch: incremental keyed state over an ordered
stream (SURVEY.md §2 custom-operator rule (b)/(c)).

Almost everything in this engine is a Dataset transform; this module is
the documented exception pattern for semantics the Dataset API cannot
express — state that must evolve incrementally across an ordered
stream. Used here for incremental sessionization, equality-tested
against the batch groupby implementation (queries.sessionize_events).

Scale shape (round-3 rewrite — the round-2 form streamed every sorted
row through the DRIVER and fanned slices out, a single-node funnel):

1. ``sort(ts, event_id)`` — the usual range-partitioned all-to-all;
   afterwards every block is a contiguous, non-overlapping ts range.
2. ``map_batches`` computes per-(key, slice) session SUMMARIES —
   ``(first_ts, last_ts, internal_gap_count)`` — vectorized, entirely
   inside the cluster. Summaries over contiguous ranges form a monoid:
   ``merge(L, R) -> (L.first, R.last, L.n + R.n + (R.first - L.last >
   gap))``, so slice arrival ORDER no longer matters — the fold happens
   once per key over summaries sorted by their range start. This
   replaces the round-2 submission-order dependence outright.
3. Each map task fans its (tiny, payload-free) summaries directly to a
   pool of key-hashed state actors and awaits the acks, so pipeline
   completion implies delivery and actor inboxes provide backpressure.
   The driver's only traffic is the final (key, n_sessions) dict.

Caveat (documented, matches the batch path's assumptions): summary
delivery is at-least-once under Ray task RETRY — a map task that dies
AFTER some consume() calls and reruns would double-send. The driver
gates on correctness tests; exactly-once would tag slices with
(block, offset) ids and dedupe in the actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stateful_sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                        gap_minutes: int = 30, num_actors: int = 4) -> pd.DataFrame:
    """Incremental session counting: (key, n_sessions) via per-slice
    summaries merged in key-hashed state actors. See module docstring
    for the distributed shape."""
    import ray

    gap_us = gap_minutes * 60 * 1_000_000

    @ray.remote
    class SessionState:
        """Owns hash(key) % N of the keyspace. ``consume`` appends
        per-key range summaries (arrival-order free); ``result`` folds
        each key's summaries in range order with the session monoid."""

        def __init__(self, gap: int):
            self.gap = gap
            self.parts: dict = {}

        def consume(self, keys, firsts, lasts, ngaps) -> None:
            parts = self.parts
            for k, f, l, n in zip(keys.tolist(), firsts.tolist(),
                                  lasts.tolist(), ngaps.tolist()):
                parts.setdefault(k, []).append((f, l, n))

        def result(self) -> dict:
            out: dict = {}
            for k, ps in self.parts.items():
                ps.sort()  # contiguous disjoint ranges → order by start
                n = 1 + sum(p[2] for p in ps)
                for (f1, l1, _), (f2, l2, _) in zip(ps, ps[1:]):
                    if f2 - l1 > self.gap:
                        n += 1
                out[k] = n
            return out

    actors = [SessionState.remote(gap_us) for _ in range(num_actors)]

    ordered = ds.sort([ts_col, "event_id"]) if "event_id" in ds.schema().names \
        else ds.sort(ts_col)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        if len(batch) == 0:
            return pd.DataFrame({"n_keys": pd.Series([], dtype="int64")})
        keys = batch[key_col].to_numpy()
        if batch[ts_col].dtype.kind == "M":
            # normalize to µs regardless of the pandas datetime unit
            # (pandas ≥2 preserves Arrow's unit: us here, ns elsewhere)
            tss = batch[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        else:
            tss = batch[ts_col].to_numpy()
        # vectorized within the slice: one grouped pass yields each
        # key's (first, last, in-slice gap count)
        df = pd.DataFrame({"k": keys, "t": tss})
        g = df.groupby("k", sort=False)["t"]
        ngaps = (g.diff() > gap_us).groupby(df["k"], sort=False).sum()
        firsts = g.first()
        lasts = g.last()
        uk = firsts.index.to_numpy()
        buckets = pd.util.hash_array(uk) % num_actors
        refs = []
        for b in range(num_actors):
            m = buckets == b
            if m.any():
                refs.append(actors[b].consume.remote(
                    uk[m], firsts.to_numpy()[m], lasts.to_numpy()[m],
                    ngaps.to_numpy().astype(np.int64)[m]))
        # ack before the task completes: pipeline completion ⇒ every
        # summary is in its actor; actor mailboxes give backpressure
        _ray.get(refs)
        return pd.DataFrame({"n_keys": [len(uk)]})

    # drive the pipeline; rows never leave the cluster — the count()
    # consumes only the 1-row-per-slice ack frames
    ordered.map_batches(summarize, batch_format="pandas",
                        batch_size=8192).count()

    merged: dict = {}
    for r in ray.get([a.result.remote() for a in actors]):
        merged.update(r)
    out = pd.DataFrame({key_col: list(merged), "n_sessions": list(merged.values())})
    return out.astype({key_col: "int64", "n_sessions": "int64"}).sort_values(
        key_col).reset_index(drop=True)
