"""The raw-actor escape hatch: incremental keyed state over an ordered
stream (SURVEY.md §2 custom-operator rule (b)/(c)).

Almost everything in this engine is a Dataset transform; this module is
the documented exception pattern for semantics the Dataset API cannot
express — state that must evolve incrementally across batches in event
order (the guide's "one actor per key-hash bucket, fed batches in ts
order"). Used here for incremental sessionization, equality-tested
against the batch groupby implementation (queries.sessionize_events).

Ordering assumption (explicit): the input stream is consumed in global
ts order (``ds.sort(ts)``); each actor owns ``hash(key) % N`` and sees
its keys' events in order — guaranteed WITHOUT per-batch barriers
because Ray executes an actor's tasks in submission order, so the
fan-out is pipelined (a bounded ``ray.wait`` window is backpressure
only). At cluster scale the sort is the usual range-partitioned
all-to-all; the driver streams sorted batches and fans slices out to
the actor pool without materializing the dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stateful_sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                        gap_minutes: int = 30, num_actors: int = 4) -> pd.DataFrame:
    """Incremental session counting: (key, n_sessions) via a pool of
    state-holding actors fed the ts-sorted stream."""
    import ray

    gap_us = gap_minutes * 60 * 1_000_000

    @ray.remote
    class SessionState:
        def __init__(self):
            self.last_ts: dict = {}
            self.sessions: dict = {}

        def consume(self, keys, tss) -> None:
            # vectorized within the slice: per-key in-slice gap counts
            # via one pandas groupby; dict traffic is one get/set per
            # DISTINCT key in the slice, not per row
            df = pd.DataFrame({"k": keys, "t": tss})
            g = df.groupby("k", sort=False)["t"]
            inc = (g.diff() > gap_us).groupby(df["k"], sort=False).sum()
            firsts = g.first()
            lasts = g.last()
            for k, n_in in inc.items():
                last = self.last_ts.get(k)
                boundary = 1 if (last is None
                                 or firsts[k] - last > gap_us) else 0
                self.sessions[k] = (self.sessions.get(k, 0)
                                    + int(n_in) + boundary)
                self.last_ts[k] = int(lasts[k])

        def result(self) -> dict:
            return dict(self.sessions)

    actors = [SessionState.remote() for _ in range(num_actors)]
    pending = []
    ordered = ds.sort([ts_col, "event_id"]) if "event_id" in ds.schema().names \
        else ds.sort(ts_col)
    for batch in ordered.iter_batches(batch_size=8192, batch_format="pandas"):
        keys = batch[key_col].to_numpy()
        if batch[ts_col].dtype.kind == "M":
            # normalize to µs regardless of the pandas datetime unit
            # (pandas ≥2 preserves Arrow's unit: us here, ns elsewhere)
            tss = batch[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        else:
            tss = batch[ts_col].to_numpy()
        buckets = pd.util.hash_array(keys) % num_actors
        # PIPELINED fan-out: Ray executes an actor's tasks in
        # SUBMISSION order, so per-actor event order is preserved
        # without a per-round barrier (the old ray.get per batch was a
        # serial driver floor); a bounded ray.wait window provides
        # backpressure only
        while len(pending) > 4 * num_actors:
            _, pending = ray.wait(pending, num_returns=1)
        for b in range(num_actors):
            m = buckets == b
            if m.any():
                pending.append(actors[b].consume.remote(keys[m], tss[m]))
    if pending:
        ray.get(pending)
    merged: dict = {}
    for r in ray.get([a.result.remote() for a in actors]):
        merged.update(r)
    out = pd.DataFrame({key_col: list(merged), "n_sessions": list(merged.values())})
    return out.astype({key_col: "int64", "n_sessions": "int64"}).sort_values(
        key_col).reset_index(drop=True)
