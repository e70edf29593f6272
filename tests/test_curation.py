"""Curation tier: duplicate-substring grams, PII redaction, Gopher
rules, contamination probe, sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_to_text_ray.stages.curation import (
    _gram_hashes,
    _word_ngrams,
    benchmark_gram_set,
    contamination_stats,
    duplicate_gram_stats,
    gopher_stats_batch,
    gram_pairs_batch,
    pii_redact_batch,
)

SF = "/root/testdata/sf0.001"


def _tbl(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


# ── duplicate grams ───────────────────────────────────────────────────

def test_gram_hashes_selection_and_short_docs():
    import hashlib

    assert _gram_hashes("", 24, 12) == set()
    assert _gram_hashes("x" * 23, 24, 12) == set()
    # selection is content-keyed: a gram is kept iff its own md5
    # satisfies the mod-rate rule, independent of position
    t = "abcdefghijklmnopqrstuvwxyz0123456789" * 4
    got = _gram_hashes(t, 24, 12)
    want = set()
    for i in range(len(t) - 23):
        h = hashlib.md5(t[i:i + 24].encode()).hexdigest()[:16]
        if int(h[:4], 16) % 12 == 0:
            want.add(h)
    assert got == want and len(got) > 0


def test_gram_sampling_is_alignment_independent():
    """The property the content-keyed sampling exists for: a shared
    span selects the SAME grams in both docs even when its start
    offsets differ (the old doc-absolute stride missed these)."""
    span = "the quick brown fox jumps over the lazy dog repeatedly " * 4
    a = _gram_hashes(span, 24, 12)
    b = _gram_hashes("Xy! " + span, 24, 12)  # shifted by 4 (≠ 0 mod 12)
    assert a and a <= b


def test_gram_pairs_distinct_per_doc():
    # repeated content inside ONE doc yields one posting per gram;
    # build a 24-char gram the content-keyed sampler definitely keeps
    import hashlib

    gram = next(
        c * 24 for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        if int(hashlib.md5((c * 24).encode()).hexdigest()[:4], 16) % 12 == 0)
    t = _tbl([7], [gram + gram])
    out = gram_pairs_batch(t)
    assert gram * 2 == (gram + gram)  # the doc is one repeated gram
    assert out.num_rows == 1
    assert out["doc_id"].to_pylist() == [7]


def test_duplicate_gram_stats_clones(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog " * 3
    # varied (non-repeating) text so the content-keyed sampler keeps
    # some grams — a repeated short unit has few DISTINCT grams and may
    # select none
    uniq = " ".join(f"u{i}x{i * 7 % 97}" for i in range(60))
    ds = rd.from_arrow(_tbl([1, 2, 3], [base, base, uniq]))
    out = duplicate_gram_stats(ds, num_buckets=4).to_pandas()
    out = out.set_index("doc_id").sort_index()
    # clones: every gram duplicated; unique doc: none
    assert out.loc[1, "n_dup_grams"] == out.loc[1, "n_grams"]
    assert out.loc[2, "dup_ratio"] == 1.0
    assert out.loc[3, "n_dup_grams"] == 0


# ── PII redaction ─────────────────────────────────────────────────────

def test_pii_redact_counts_and_text():
    t = _tbl([1, 2], [
        "mail a.b+c@ex-1.org or d@e.io ip 10.0.0.1 call +1-555-0100",
        "no pii here",
    ])
    out = pii_redact_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_email"] == 2
    assert out.loc[1, "n_ip"] == 1
    assert out.loc[1, "n_phone"] == 1
    assert out.loc[1, "redacted"] == \
        "mail <EMAIL> or <EMAIL> ip <IP> call <PHONE>"
    assert out.loc[2].tolist() == [0, 0, 0, "no pii here"]


def test_pii_redact_email_before_ip():
    # the numeric-ish email must be consumed by the email pass, not
    # half-eaten by the IP pass
    t = _tbl([1], ["1.2.3.4@mail.com then 1.2.3.4"])
    out = pii_redact_batch(t).to_pandas()
    assert out["redacted"][0] == "<EMAIL> then <IP>"
    assert out["n_email"][0] == 1 and out["n_ip"][0] == 1


# ── Gopher rules ──────────────────────────────────────────────────────

def test_gopher_stats():
    long_good = " ".join(["the", "and"] + ["word"] * 60)
    short = "tiny doc the a"
    no_stop = " ".join(["word"] * 60)
    t = _tbl([1, 2, 3, 4], [long_good, short, no_stop, ""])
    out = gopher_stats_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "keep_flag"] == 1
    assert out.loc[2, "keep_flag"] == 0          # too few words
    assert out.loc[3, "keep_flag"] == 0          # no stopwords
    assert out.loc[4, "n_words"] == 0 and out.loc[4, "keep_flag"] == 0
    assert out.loc[1, "n_stop"] == 2
    nw = out.loc[1, "n_words"]
    assert out.loc[1, "mean_word_len"] == pytest.approx(
        (len(long_good) - (nw - 1)) / nw)


# ── contamination ─────────────────────────────────────────────────────

def test_word_ngrams():
    assert _word_ngrams("a b c d", 3) == ["a b c", "b c d"]
    assert _word_ngrams("a b", 3) == []
    assert _word_ngrams("", 3) == []


def test_contamination_roundtrip(ray_session):
    import ray
    import ray.data as rd

    bench = rd.from_arrow(_tbl([100], ["alpha beta gamma delta"]))
    grams = benchmark_gram_set(bench, n=3)
    assert grams == {"alpha beta gamma", "beta gamma delta"}
    cand = rd.from_arrow(_tbl(
        [1, 2, 3],
        ["x alpha beta gamma y", "nothing shared here at all", "a b"]))
    out = contamination_stats(cand, ray.put(grams), n=3).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "n_contam"] == 1 and out.loc[1, "contaminated"] == 1
    assert out.loc[2, "n_contam"] == 0
    assert 3 not in out.index  # fewer than n words → absent


# ── DSIR ──────────────────────────────────────────────────────────────

def test_dsir_target_docs_score_higher(ray_session):
    import ray
    import ray.data as rd

    from pdf_to_text_ray.stages.curation import dsir_log_ratios, dsir_weights

    # target slice talks about cats, raw slice about dogs
    ids = list(range(8))
    texts = ["cat cat feline cat"] * 2 + ["dog dog canine dog bark"] * 6
    ds = rd.from_arrow(_tbl(ids, texts))
    ratios = dsir_log_ratios(ds, target_expr=lambda a: a < 2)
    assert set(ratios.columns) == {"f", "ratio"}
    out = dsir_weights(ds, ray.put(ratios)).to_pandas().set_index("doc_id")
    # cat-docs carry target-favored features, dog-docs raw-favored
    assert out.loc[0, "dsir_weight"] > out.loc[2, "dsir_weight"]
    assert out.loc[2, "dsir_weight"] < 0 < out.loc[0, "dsir_weight"]


# ── top-bigram repetition ─────────────────────────────────────────────

def test_top_bigram():
    from pdf_to_text_ray.stages.curation import top_bigram_batch

    t = _tbl([1, 2, 3], ["a b a b a", "x y", "solo"])
    out = top_bigram_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "top_bigram"] == "a b"
    assert out.loc[1, "top_n"] == 2
    assert out.loc[1, "bigram_fraction"] == pytest.approx(0.5)
    assert out.loc[2, "top_bigram"] == "x y"
    assert 3 not in out.index  # single word → no bigrams


def test_top_bigram_tie_lexicographic():
    from pdf_to_text_ray.stages.curation import top_bigram_batch

    out = top_bigram_batch(_tbl([1], ["b a c d"])).to_pandas()
    # all bigrams occur once: tie breaks to the smallest string
    assert out["top_bigram"][0] == "a c"


# ── BM25 ──────────────────────────────────────────────────────────────

def test_bm25_relevance_order(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.index import bm25_topk

    docs = _tbl(
        [1, 2, 3, 4],
        ["hash join hash join hash",            # dense in both terms
         "hash table scan merge sort",          # one term
         "table scan merge sort filter",        # neither
         "join order" + " filler" * 50])        # one term, long doc
    out = bm25_topk(rd.from_arrow(docs), ["hash", "join"], topk=3)
    assert out["doc_id"].tolist()[0] == 1
    assert 3 not in out["doc_id"].tolist()
    assert (out["score"].to_numpy() >= 0).all()
    # scores are monotonically nonincreasing in rank order
    assert (np.diff(out["score"].to_numpy()) <= 0).all()


# ── sequence packing ──────────────────────────────────────────────────

def test_curation_pipeline_invariants(ray_session):
    from pdf_to_text_ray.pipelines.curate import curate_documents
    from pdf_to_text_ray.pipelines.queries import (contaminated_docs,
                                                   gopher_quality_docs)

    out = curate_documents(SF).to_pandas().sort_values("doc_id")
    assert len(out) > 0
    assert set(out.columns) == {"doc_id", "lang", "source", "n_tokens",
                                "seq_id"}
    # every survivor passed the Gopher gate
    g = gopher_quality_docs(SF).to_pandas().set_index("doc_id")
    assert (g.loc[out["doc_id"], "keep_flag"] == 1).all()
    # no survivor is contaminated
    c = contaminated_docs(SF).to_pandas().set_index("doc_id")
    hit = c.index.intersection(out["doc_id"])
    assert (c.loc[hit, "contaminated"] == 0).all()
    # benchmark docs share all their grams with the benchmark set, so
    # the contamination stage always drops them
    assert (out["doc_id"].to_numpy() % 97 != 0).all()
    # packing invariant: seq ids reconstruct from the token cumsum
    cum = out["n_tokens"].cumsum().to_numpy()
    start = cum - out["n_tokens"].to_numpy()
    assert (out["seq_id"].to_numpy() == start // 256).all()


def test_exact_dedup_keep_drops_clones(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.pipelines.curate import _exact_dedup_keep

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["same text", "same text", "different"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
    })
    out = _exact_dedup_keep(rd.from_arrow(t), num_buckets=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_pack_sequences_invariants(ray_session):
    from pdf_to_text_ray.pipelines.queries import PACK_BUDGET, pack_doc_sequences

    out = pack_doc_sequences(SF).to_pandas().sort_values("doc_id")
    cum = out["n_tokens"].cumsum().to_numpy()
    start = cum - out["n_tokens"].to_numpy()
    assert (out["seq_id"].to_numpy() == start // PACK_BUDGET).all()
    # sequence ids are nondecreasing in doc order and start at 0
    assert out["seq_id"].iloc[0] == 0
    assert (np.diff(out["seq_id"].to_numpy()) >= 0).all()


def test_rag_index_pipeline_invariants(ray_session, tmp_path):
    """gate → dedup → chunk → embed → split composition: clones chunk
    once, chunk counts follow the stride arithmetic, splits are the
    md5-portable assignment, embeddings are unit-norm."""
    import hashlib
    import math
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_to_text_ray.pipelines.curate import rag_index_pipeline
    from pdf_to_text_ray.stages.curation import gopher_stats_batch

    body = ("the quick brown fox jumps over a lazy dog and that should "
            "be enough normal words to have the gate keep this text " * 4)
    rows = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [body, body,              # 2 = exact clone of 1
                 "x " * 200,              # fails gopher (no stopwords)
                 body + " tail tail"],
    })
    sf = str(tmp_path)
    pq.write_table(rows, os.path.join(sf, "documents.parquet"))
    out = rag_index_pipeline(sf).to_pandas()

    # gopher gate drops 3; exact dedup drops the clone (keeps min id 1)
    assert set(out["doc_id"]) == {1, 4}
    s = gopher_stats_batch(rows)
    assert s["keep_flag"].to_numpy().tolist() == [1, 1, 0, 1]

    # chunk arithmetic: one window per stride start → ceil(n/stride)
    for did in (1, 4):
        n_toks = len(rows["text"][did - 1].as_py().split(" "))
        want = max(math.ceil(n_toks / 48), 1)
        got = (out["doc_id"] == did).sum()
        assert got == want, (did, n_toks, got, want)

    # split is the portable md5 uniform of doc_id
    for did in (1, 4):
        u = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) / 2**32
        want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert (out.loc[out["doc_id"] == did, "split"] == want).all()

    # hashed embeddings are l2-normalized
    assert np.allclose(out["emb_norm"], 1.0)


def test_gram_hashes_vectorized_matches_hashlib():
    """The numpy single-block MD5 fast path must select and spell the
    exact same grams as the scalar hashlib loop (which the DuckDB
    oracle replays), on ASCII and across the chunking boundary; the
    non-ASCII tail stays on the scalar path and both agree on mixed
    content."""
    import hashlib
    import random

    from pdf_to_text_ray.stages.curation import _gram_hashes

    rng = random.Random(3)
    ascii_text = " ".join(
        "".join(rng.choice("abcdefgh ") for _ in range(30))
        for _ in range(60))

    def scalar(text, k, rate):
        out = set()
        for i in range(len(text) - k + 1):
            h = hashlib.md5(text[i:i + k].encode("utf-8")).hexdigest()[:16]
            if int(h[:4], 16) % rate == 0:
                out.add(h)
        return out

    assert _gram_hashes(ascii_text, 24, 12) == scalar(ascii_text, 24, 12)
    # non-ASCII goes through the scalar path — same result either way
    uni = ascii_text[:200] + "héllo wörld ünïcode " + ascii_text[200:400]
    assert _gram_hashes(uni, 24, 12) == scalar(uni, 24, 12)
    # short/empty edge cases
    assert _gram_hashes("", 24, 12) == set()
    assert _gram_hashes("short", 24, 12) == set()


# ── URL canonicalization (stages/urls.py) ─────────────────────────────

def test_canonicalize_url_rules():
    from pdf_to_text_ray.stages.urls import canonicalize_url as c
    # scheme/host lowercase, default port, fragment
    assert c("HTTPS://Example.COM:443/Path#frag") == "https://example.com/Path"
    assert c("HTTP://a.b:80/x") == "http://a.b/x"
    # non-default port kept; path case kept
    assert c("https://a.b:8080/CaSe") == "https://a.b:8080/CaSe"
    # tracking params dropped, rest sorted, empty query dropped
    assert c("http://h/p?utm_source=x&b=2&a=1") == "http://h/p?a=1&b=2"
    assert c("http://h/p?fbclid=z&gclid=1&utm_medium=m") == "http://h/p"
    assert c("http://h/p?") == "http://h/p"
    assert c("http://h/p?z=1&y=2&z=0") == "http://h/p?y=2&z=0&z=1"
    # utm prefix with and without '='
    assert c("http://h/p?utm_x&k=v") == "http://h/p?k=v"
    # malformed / schemeless: stable passthrough
    assert c("not a url") == "not a url"
    assert c("example.com/x") == "example.com/x"
    # :80 on https is NOT a default port
    assert c("https://h:80/p") == "https://h:80/p"


def test_canonicalize_batch_null_safe():
    import pyarrow as pa
    from pdf_to_text_ray.stages.urls import canonicalize_batch
    t = pa.table({"url": pa.array(
        ["HTTP://A:80/x", None, "https://b/?utm_a=1"], pa.string())})
    out = canonicalize_batch(t)
    assert out["url_canon"].to_pylist() == ["http://a/x", None, "https://b/"]


def test_blocklist_filter_rules():
    import pyarrow as pa

    from pdf_to_text_ray.stages.urls import BlocklistFilter

    flt = BlocklistFilter([("a.com", "/x"), ("a.com", "/y/z"),
                           ("b.com", "/")])
    t = pa.table({
        "host": ["a.com", "a.com", "a.com", "b.com", "c.com", "a.com"],
        "path": ["/x/1", "/y/1", "/y/z/2", "/anything", "/x/1", "/xy"],
    })
    out = flt(t)
    # "/xy" IS blocked by prefix "/x" — robots prefix semantics are
    # byte-prefix, not path-segment (documented, matches starts_with).
    assert out["blocked"].to_pylist() == [True, False, True, True,
                                          False, True]


def test_blocklist_filter_null_and_empty():
    import pyarrow as pa

    from pdf_to_text_ray.stages.urls import BlocklistFilter

    flt = BlocklistFilter([])
    t = pa.table({"host": pa.array([None, "a.com"], pa.string()),
                  "path": pa.array(["/x", None], pa.string())})
    assert flt(t)["blocked"].to_pylist() == [False, False]


def test_curate_neardup_pairs_never_land_on_driver(ray_session, monkeypatch):
    """The composed flagship must route near-dup detection through the
    output="dataset" path: the candidate-pair set stays a Dataset end
    to end (VERDICT r04 task 5) — a driver-side pair DataFrame would
    bound the pipeline by driver memory on mirror-heavy crawls."""
    import ray.data

    from pdf_to_text_ray.stages import dedup as dedup_mod
    from pdf_to_text_ray.pipelines.curate import curate_documents

    calls = []
    orig = dedup_mod.minhash_neardup_pairs

    def spy(ds, **kw):
        out = orig(ds, **kw)
        calls.append((kw.get("output"), type(out)))
        return out

    monkeypatch.setattr(dedup_mod, "minhash_neardup_pairs", spy)
    res = curate_documents(SF).to_pandas()
    assert len(res) > 0
    assert calls, "curate_documents never reached the near-dup stage"
    for output_kw, out_type in calls:
        assert output_kw == "dataset"
        assert issubclass(out_type, ray.data.Dataset), out_type
        assert not issubclass(out_type, pd.DataFrame)
