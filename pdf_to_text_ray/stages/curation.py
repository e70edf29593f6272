"""Training-data curation operators: exact duplicate-substring
detection (gram-quantized, after Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better"), PII redaction, Gopher
quality rules (Rae et al. 2021 "Scaling Language Models: ... Gopher"
§A1.1), benchmark n-gram contamination checks (GPT-3 appendix C /
PaLM-style), and sequence packing via distributed prefix sum.

Scale notes (the 100 TB contract per stage):

- ``duplicate_gram_stats``: the payload never shuffles — stage 1 emits
  only (16-hex-char gram hash, doc_id) pairs, distinct per doc; one
  hash-bucketed exchange groups each gram's postings so a bucket marks
  duplicated grams locally; the per-doc rollup shuffles only
  (doc_id, 0/1) pairs. Hot grams (boilerplate repeated in millions of
  docs) inflate one posting list but never a Python loop — the bucket
  kernel is a vectorized ``transform("size")``.
- ``pii_redact_batch`` / ``gopher_stats_batch``: per-batch compiled
  regex / numpy kernels, no cross-row state, stateless map.
- ``contamination_stats``: the benchmark gram set is bounded (a
  benchmark suite, not the corpus) — built distributed, collected once,
  broadcast via ``ray.put``; each batch probes a frozenset. The
  documented assumption is |benchmark grams| ≪ corpus (true for real
  eval suites: ~10^6 grams vs 10^12 docs).

Reference anchor: the reference has no curation tier (one document per
HTTP request, `/root/reference/src/main.ts:136-148`); these operators
are the web-scale additions the north rule and brief require.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .groups import arrow_out, bucketed_group_apply

# ── exact duplicate-substring detection (gram-quantized) ─────────────

#: gram length in CHARS (spans ~4 words of web text) and sampling rate
#: (~1/rate of positions kept). Sampling is CONTENT-KEYED — a gram is
#: kept iff its own hash ≡ 0 (mod rate), the classic mod-p
#: fingerprinting (Manber 1994) — so two copies of a span select the
#: SAME grams regardless of where the span starts in each doc. (The
#: earlier doc-absolute stride sampling missed duplicates whose start
#: offsets differed mod stride.) Detection probability: a duplicated
#: run with g gram positions is missed with p = (1-1/rate)^g — ~11% at
#: g=25 (a 48-char run), <2% from g≈45 (runs ≥ ~68 chars) at rate 12.
#: A doc can emit NO grams at all (every position missed) — absent
#: rows mean "no sample", not "no duplication". Selection is keyed on
#: the SAME portable hash the SQL twin computes (a cheaper rolling-hash
#: pre-screen cannot predict md5 % rate); the md5-per-position cost is
#: paid vectorized — stages/md5np runs the single-block MD5 compression
#: across all window positions in numpy, bit-identical to hashlib.
DUP_K = 24
DUP_RATE = 12


def _gram_hashes(text: str, k: int, rate: int) -> set[str]:
    """Distinct 16-hex-char md5 hashes of the content-sampled k-char
    grams: keep gram at position i iff
    ``int(md5(gram)[:4], 16) % rate == 0``.

    md5 (not the repo's polynomial hash) so the DuckDB oracle computes
    the identical value AND the identical selection with
    ``substr(md5(substr(text,i,k)), 1, 16)``.

    ASCII docs (char windows == byte windows, single MD5 block at
    k ≤ 55) take the numpy-vectorized single-block MD5
    (``stages/md5np``, bit-identical, ~7× fewer ns/position); the
    scalar hashlib loop remains for the non-ASCII / long-gram tail."""
    if text.isascii() and k <= 55:
        from .md5np import gram_select_hexes

        data = np.frombuffer(text.encode("ascii"), np.uint8)
        return set(gram_select_hexes(data, k, rate))
    out: set[str] = set()
    for i in range(0, len(text) - k + 1):
        h = hashlib.md5(text[i:i + k].encode("utf-8")).hexdigest()[:16]
        if int(h[:4], 16) % rate == 0:
            out.add(h)
    return out


def gram_pairs_batch(t: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text", k: int = DUP_K,
                     rate: int = DUP_RATE) -> pa.Table:
    """(gram hash, doc id) postings, distinct per doc. Docs shorter
    than k emit nothing (mirrored by the oracle's WHERE length>=k)."""
    ids = t[id_col].to_numpy(zero_copy_only=False)
    texts = t[text_col].to_pylist()
    ghs: list[str] = []
    dids: list[int] = []
    for did, text in zip(ids, texts):
        hs = _gram_hashes(text or "", k, rate)
        ghs.extend(hs)
        dids.extend([did] * len(hs))
    return pa.table({"gh": pa.array(ghs, pa.string()),
                     "doc_id": pa.array(np.asarray(dids, dtype=np.int64))})


def duplicate_gram_stats(ds, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = DUP_K,
                         rate: int = DUP_RATE, num_buckets: int = 32):
    """Per-doc duplicated-substring stats: of the doc's distinct
    content-sampled k-grams, how many occur in ≥2 distinct docs.

    Returns a Dataset with columns (doc_id, n_grams, n_dup_grams,
    dup_ratio). Two payload-free shuffles: gram-hash postings, then
    (doc_id, flag) rollup."""
    from ray.data.aggregate import Count, Sum

    pairs = ds.map_batches(
        lambda t: gram_pairs_batch(t, id_col=id_col, text_col=text_col,
                                   k=k, rate=rate),
        batch_format="pyarrow")

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (gh, doc) ⇒ group size == distinct docs
        nd = df.groupby("gh")["doc_id"].transform("size")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "dup": (nd >= 2).to_numpy().astype(np.int64)})

    flagged = bucketed_group_apply(pairs, "gh", mark_dups,
                                   num_buckets=num_buckets)
    rolled = (flagged.groupby("doc_id")
              .aggregate(Count(alias_name="n_grams"),
                         Sum("dup", alias_name="n_dup_grams")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_grams"].to_numpy().astype(np.int64)
        d = t["n_dup_grams"].to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(n),
            "n_dup_grams": pa.array(d),
            "dup_ratio": pa.array(d / n),  # n ≥ 1 by construction
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


# ── PII redaction ─────────────────────────────────────────────────────

# RE2-compatible (no lookaround/backreference) so the DuckDB oracle
# runs the IDENTICAL patterns via regexp_replace(..., 'g').
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

_PII_ORDER = (  # email first: its local part may contain dots/digits
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)
_PII_COMPILED = [(re.compile(p), tag) for p, tag in _PII_ORDER]


def pii_redact_batch(t: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Count + redact emails / IPv4s / phone numbers per row.

    Output columns: id, n_email, n_ip, n_phone, redacted. Patterns are
    compiled once at module import; the kernel is a per-row sub() over
    the one text column (regex over strings is inherently per-row; no
    other column is touched)."""
    ids = t[id_col]
    texts = t[text_col].to_pylist()
    counts = np.zeros((len(texts), 3), dtype=np.int64)
    red: list[str] = []
    for i, text in enumerate(texts):
        s = text or ""
        for j, (rx, tag) in enumerate(_PII_COMPILED):
            s, n = rx.subn(tag, s)
            counts[i, j] = n
        red.append(s)
    return pa.table({
        id_col: ids,
        "n_email": pa.array(counts[:, 0]),
        "n_ip": pa.array(counts[:, 1]),
        "n_phone": pa.array(counts[:, 2]),
        "redacted": pa.array(red, pa.string()),
    })


# ── Gopher quality rules ──────────────────────────────────────────────

#: Gopher §A1.1 uses an 8-word stop set; the corpus vocabulary supplies
#: these two, the rest simply never fire. Counted as OCCURRENCES (the
#: published rule: "contains at least two stop words").
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_STOP_HITS = 2

_STOPSET = frozenset(GOPHER_STOPWORDS)


def gopher_stats_batch(t: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Gopher repetition-free quality gate (the word-level rules the
    driver tables can express; line-level rules live in analysis.py's
    CCNet line dedup). Splits on single spaces — the exact semantics
    the SQL twin's str_split(text, ' ') uses."""
    ids = t[id_col]
    texts = t[text_col].to_pylist()
    n_words = np.zeros(len(texts), dtype=np.int64)
    mean_wlen = np.zeros(len(texts), dtype=np.float64)
    n_stop = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        s = text or ""
        words = s.split(" ") if s else []
        nw = len(words)
        n_words[i] = nw
        if nw:
            mean_wlen[i] = (len(s) - (nw - 1)) / nw
            n_stop[i] = sum(1 for w in words if w in _STOPSET)
    keep = ((n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
            & (mean_wlen >= GOPHER_MIN_MEAN_WLEN)
            & (mean_wlen <= GOPHER_MAX_MEAN_WLEN)
            & (n_stop >= GOPHER_MIN_STOP_HITS))
    return pa.table({
        id_col: ids,
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(mean_wlen),
        "n_stop": pa.array(n_stop),
        "keep_flag": pa.array(keep.astype(np.int64)),
    })


# ── Gopher repetition rule: top-bigram mass ───────────────────────────

def top_bigram_batch(t: pa.Table, *, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Per-doc most-frequent word bigram and its share of all bigram
    positions (Gopher §A1.1 'fraction of characters in most common
    n-gram' family, word-bigram variant). Ties break to the
    lexicographically smallest bigram — deterministic on both sides.
    Docs with <2 words emit nothing. Purely doc-local: no shuffle."""
    from collections import Counter

    ids = t[id_col].to_numpy(zero_copy_only=False)
    out_id: list[int] = []
    out_g: list[str] = []
    out_n: list[int] = []
    out_f: list[float] = []
    for did, text in zip(ids, t[text_col].to_pylist()):
        words = (text or "").split(" ") if text else []
        if len(words) < 2:
            continue
        c = Counter(zip(words, words[1:]))
        top_n = max(c.values())
        top = min(g for g, n in c.items() if n == top_n)
        total = len(words) - 1
        out_id.append(did)
        out_g.append(" ".join(top))
        out_n.append(top_n)
        out_f.append(top_n / total)
    return pa.table({
        id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
        "top_bigram": pa.array(out_g, pa.string()),
        "top_n": pa.array(np.asarray(out_n, dtype=np.int64)),
        "bigram_fraction": pa.array(np.asarray(out_f, dtype=np.float64)),
    })


# ── DSIR importance weights (Xie et al. 2023) ─────────────────────────

def _uni_bi_grams(text: str) -> list[str]:
    """Word unigram + bigram features (the paper hashes these into a
    fixed-width bucket table; with a bounded vocabulary the raw grams
    keep the oracle exact — at 100 TB swap in the md5-bucket variant
    and the pipeline shape is unchanged)."""
    words = text.split(" ") if text else []
    feats = list(words)
    feats.extend(f"{a} {b}" for a, b in zip(words, words[1:]))
    return feats


def _feature_counts_batch(t: pa.Table, *, text_col: str,
                          target_expr) -> pa.Table:
    """Per-batch partial feature counts, split target vs raw — the
    pre-aggregation half of the DSIR distribution estimate. Only
    (feature, nt, nr) partials leave the task."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    is_t = target_expr(ids)
    nt: dict[str, int] = {}
    nr: dict[str, int] = {}
    for flag, text in zip(is_t, t[text_col].to_pylist()):
        d = nt if flag else nr
        for f in _uni_bi_grams(text or ""):
            d[f] = d.get(f, 0) + 1
    feats = sorted(set(nt) | set(nr))
    return pa.table({
        "f": pa.array(feats, pa.string()),
        "nt": pa.array([nt.get(f, 0) for f in feats], pa.int64()),
        "nr": pa.array([nr.get(f, 0) for f in feats], pa.int64()),
    })


def dsir_log_ratios(ds, *, text_col: str = "text",
                    target_expr=None) -> "pd.DataFrame":
    """Smoothed log-ratio table log(p̂_target(f)/p̂_raw(f)) over the
    joint feature vocabulary (add-1 smoothing on both distributions).
    One payload-free (feature, partial-count) shuffle; the result is
    bounded by the feature vocabulary (paper: a FIXED hash-bucket
    width), collected once and broadcast."""
    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(
            lambda t: _feature_counts_batch(t, text_col=text_col,
                                            target_expr=target_expr),
            batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("nt", alias_name="nt"), Sum("nr", alias_name="nr"))
        .to_pandas())
    v = len(counts)
    tt = counts["nt"].sum() + v
    tr = counts["nr"].sum() + v
    counts["ratio"] = (np.log((counts["nt"].to_numpy() + 1) / tt)
                       - np.log((counts["nr"].to_numpy() + 1) / tr))
    return counts[["f", "ratio"]]


def dsir_weights(ds, ratios_ref, *, id_col: str = "doc_id",
                 text_col: str = "text", ndigits: int = 2):
    """Per-doc DSIR importance weight: Σ over the doc's feature
    occurrences of the broadcast log ratio. Features absent from the
    table (impossible here — the table is built from the same corpus)
    contribute 0."""
    import ray

    def score(t: pa.Table) -> pa.Table:
        tab: pd.DataFrame = ray.get(ratios_ref)
        lut = dict(zip(tab["f"], tab["ratio"]))
        w = np.empty(t.num_rows, dtype=np.float64)
        for i, text in enumerate(t[text_col].to_pylist()):
            w[i] = sum(lut.get(f, 0.0) for f in _uni_bi_grams(text or ""))
        y = w * (10.0 ** ndigits)
        w = np.copysign(np.floor(np.abs(y) + 0.5), y) / (10.0 ** ndigits)
        return pa.table({id_col: t[id_col],
                         "dsir_weight": pa.array(w)})

    return ds.map_batches(score, batch_format="pyarrow")


# ── benchmark contamination ───────────────────────────────────────────

def _word_ngrams(text: str, n: int) -> list[str]:
    words = text.split(" ") if text else []
    if len(words) < n:
        return []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def benchmark_gram_set(bench_ds, *, text_col: str = "text",
                       n: int = 3) -> frozenset[str]:
    """Distinct word n-grams of the benchmark docs, built distributed
    (per-batch local sets → small distinct shuffle) then collected.
    Bounded by the benchmark suite's size, not the corpus."""
    def grams(t: pa.Table) -> pa.Table:
        s: set[str] = set()
        for text in t[text_col].to_pylist():
            s.update(_word_ngrams(text or "", n))
        return pa.table({"g": pa.array(sorted(s), pa.string())})

    uniq = bench_ds.map_batches(grams, batch_format="pyarrow").unique("g")
    return frozenset(uniq)


def contamination_stats(ds, bench_grams_ref, *, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3):
    """Per-doc count of word-n-gram positions matching the broadcast
    benchmark gram set (counts positions, not distinct grams — the
    published contamination metric is overlap mass). Docs with fewer
    than n words emit nothing (oracle mirrors with len(w) >= n)."""
    import ray

    def probe(t: pa.Table) -> pa.Table:
        bench: frozenset[str] = ray.get(bench_grams_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_ids: list[int] = []
        n_contam: list[int] = []
        for did, text in zip(ids, t[text_col].to_pylist()):
            grams = _word_ngrams(text or "", n)
            if not grams:
                continue
            out_ids.append(did)
            n_contam.append(sum(1 for g in grams if g in bench))
        c = np.asarray(n_contam, dtype=np.int64)
        return pa.table({
            id_col: pa.array(np.asarray(out_ids, dtype=np.int64)),
            "n_contam": pa.array(c),
            "contaminated": pa.array((c > 0).astype(np.int64)),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def explode_token_chunks(ids, texts, *, width: int = 64, stride: int = 48):
    """Overlapping token-window chunk explode shared by
    queries.doc_overlap_chunks and curate.rag_index_pipeline (one
    definition so the flagship stays consistent with the
    oracle-checked constituent): returns parallel lists
    (ids, chunk_idx, n_tokens, chunk_text). Tokenization is a plain
    single-space split — the SQL twin's str_split."""
    out_id: list = []
    out_idx: list[int] = []
    out_n: list[int] = []
    out_text: list[str] = []
    for i, s in zip(ids, texts):
        toks = (s or "").split(" ")
        for ci, start in enumerate(range(0, len(toks), stride)):
            chunk = toks[start:start + width]
            out_id.append(i)
            out_idx.append(ci)
            out_n.append(len(chunk))
            out_text.append(" ".join(chunk))
    return out_id, out_idx, out_n, out_text
