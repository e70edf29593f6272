"""Round-17 operators: Jaro-Winkler near-dup, content-defined
chunking dedup, Zipf slope fit."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest


# ── Jaro-Winkler ─────────────────────────────────────────────────────

def test_jaro_winkler_matches_duckdb_random_sweep():
    from pdf_to_text_ray.stages.dedup import jaro_winkler_bytes

    con = duckdb.connect()
    rng = random.Random(17)
    alpha = "abcdefgh éü0 日"
    cases = [("martha", "marhta"), ("DWAYNE", "DUANE"), ("", ""),
             ("a", ""), ("", "b"), ("ab", "ab"), ("abc", "cba"),
             ("aaaa", "aaaa"), ("x" * 40, "x" * 39 + "y")]
    for _ in range(600):
        n1, n2 = rng.randint(0, 40), rng.randint(0, 40)
        a = "".join(rng.choice(alpha) for _ in range(n1))
        b = "".join(rng.choice(alpha) for _ in range(n2))
        if rng.random() < 0.5 and n1 > 3:  # near-identical regime
            b = a[:n1 // 2] + "".join(
                rng.choice(alpha) for _ in range(n1 - n1 // 2))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        got = jaro_winkler_bytes(a.encode(), b.encode())
        assert abs(want - got) < 1e-12, (a, b, want, got)


def test_jaro_winkler_classic_values():
    from pdf_to_text_ray.stages.dedup import jaro_winkler_bytes

    assert jaro_winkler_bytes(b"MARTHA", b"MARHTA") == pytest.approx(
        0.9611111111111111)
    assert jaro_winkler_bytes(b"DWAYNE", b"DUANE") == pytest.approx(0.84)
    # DuckDB parity: empty vs empty is 0, not 1
    assert jaro_winkler_bytes(b"", b"") == 0.0
    assert jaro_winkler_bytes(b"abc", b"") == 0.0


def test_jarowinkler_neardup_pairs_blocking(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.dedup import jarowinkler_neardup_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["hello world xyz", "hello world xzy",   # transposed tail
                 "hello world xyz", "totally different content here",
                 "hello world xyz", "hello world xyz"],
        "lang": ["en", "en", "en", "en", "fr", "en"],
        "n_chars": [15, 15, 15, 30, 15, 300],  # 6: other length block
    })
    pairs = jarowinkler_neardup_pairs(
        rd.from_pandas(df), threshold=0.9).to_pandas()
    got = set(zip(pairs["doc_id1"], pairs["doc_id2"]))
    # 5 blocked by lang, 6 by length bucket, 4 by similarity
    assert got == {(1, 2), (1, 3), (2, 3)}
    jw13 = pairs.loc[(pairs["doc_id1"] == 1) & (pairs["doc_id2"] == 3), "jw"]
    assert list(jw13) == [1.0]


# ── content-defined chunking ─────────────────────────────────────────

def test_cdc_chunks_partition_the_string():
    from pdf_to_text_ray.stages.dedup import cdc_chunks

    rng = random.Random(3)
    for _ in range(50):
        s = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 400)))
        chunks = cdc_chunks(s)
        assert "".join(chunks) == s
        assert all(chunks)  # no empty chunks
    assert cdc_chunks("") == []
    assert cdc_chunks("short") == ["short"]  # < one gram → single chunk


def test_cdc_chunks_shift_robust():
    """An insertion near the head only perturbs boundaries inside the
    window it touches — most chunk keys survive (the property fixed-
    width chunking lacks)."""
    from pdf_to_text_ray.stages.dedup import cdc_chunks

    rng = random.Random(11)
    base = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    shifted = "X" + base
    a = set(cdc_chunks(base))
    b = set(cdc_chunks(shifted))
    overlap = len(a & b) / max(len(a), 1)
    assert overlap > 0.8, overlap


def test_cdc_chunk_stats_shared_spans(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.stages.dedup import cdc_chunk_stats, cdc_chunks

    rng = random.Random(5)
    shared = "".join(rng.choice("abcdefgh ") for _ in range(600))
    uniq1 = "".join(rng.choice("qrstuv ") for _ in range(600))
    uniq2 = "".join(rng.choice("wxyz ") for _ in range(600))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [shared + " " + uniq1, shared + " " + uniq2, uniq1],
    })
    out = (cdc_chunk_stats(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id").sort_index())
    assert list(out.index) == [1, 2, 3]
    # docs 1 and 2 share the common prefix's chunks; doc 3 shares the
    # uniq1 chunks with doc 1
    assert (out["n_shared"] > 0).all()
    assert (out["n_distinct"] >= out["n_shared"]).all()
    assert (out["n_chunks"] >= out["n_distinct"]).all()
    # every chunk of doc 3's text re-occurs inside doc 1 EXCEPT the
    # boundary-straddling ones; the shared_ratio reflects that
    norm3 = " ".join(df.loc[2, "text"].lower().split())
    assert out.loc[3, "n_distinct"] == len(set(cdc_chunks(norm3)))


# ── Zipf slope ───────────────────────────────────────────────────────

def test_token_zipf_slope_recovers_exponent(ray_session):
    """A corpus whose token counts follow freq ∝ rank^-1 exactly must
    fit slope ≈ -1."""
    import ray.data as rd

    from pdf_to_text_ray.pipelines.queries import token_zipf_slope

    # build documents: token t_r appears round(1200/r) times
    toks = []
    for r in range(1, 101):
        toks.extend([f"tok{r:03d}"] * round(1200 / r))
    rng = random.Random(7)
    rng.shuffle(toks)
    # split into 10 docs
    docs = [" ".join(toks[i::10]) for i in range(10)]
    df = pd.DataFrame({"doc_id": range(10), "text": docs,
                       "source": ["s1"] * 10})
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        out = token_zipf_slope(d)
    assert len(out) == 1
    assert out.loc[0, "n_terms"] == 100
    assert out.loc[0, "zipf_slope"] == pytest.approx(-1.0, abs=0.02)


# ── perceptual hash ──────────────────────────────────────────────────

def test_phash64_invariances():
    """pHash's contract is over band-limited (textured) images: the
    same texture re-rendered at another size or mildly noised stays
    within a few Hamming bits; an independent texture is far."""
    from pdf_to_text_ray.fixtures.mediagen import _texture
    from pdf_to_text_ray.stages.multimodal import phash64

    a = phash64(_texture(1, 32, 32))
    assert 0 <= a < 1 << 64
    assert phash64(_texture(1, 32, 32)) == a  # deterministic
    assert bin(a ^ phash64(_texture(1, 48, 40))).count("1") <= 10
    assert bin(a ^ phash64(_texture(1, 28, 44))).count("1") <= 10
    rng = np.random.RandomState(0)
    noisy = np.clip(_texture(1, 32, 32).astype(int)
                    + rng.randint(-12, 13, (32, 32, 3)),
                    0, 255).astype(np.uint8)
    assert bin(a ^ phash64(noisy)).count("1") <= 10
    assert bin(a ^ phash64(_texture(2, 32, 32))).count("1") > 16
    assert bin(a ^ phash64(_texture(3, 32, 32))).count("1") > 16


def test_image_phash_neardup_clusters(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.fixtures.mediagen import _texture
    from pdf_to_text_ray.stages.media_codecs import encode_bmp, encode_ppm
    from pdf_to_text_ray.stages.multimodal import image_phash_neardup

    rng = np.random.RandomState(7)
    rows = []
    # base / resized / noised renders of one texture → one cluster
    noised = np.clip(_texture(5, 32, 32).astype(int)
                     + rng.randint(-10, 11, (32, 32, 3)),
                     0, 255).astype(np.uint8)
    for i, img in enumerate([_texture(5, 32, 32), _texture(5, 40, 36),
                             noised]):
        rows.append({"media_id": i, "media_type": "image",
                     "payload": encode_bmp(img),
                     "meta_width": img.shape[1],
                     "meta_height": img.shape[0], "meta_duration_ms": 0})
    # two independent textures → isolated
    for i, s in ((10, 6), (11, 7)):
        img = _texture(s, 24, 24)
        rows.append({"media_id": i, "media_type": "image",
                     "payload": encode_ppm(img),
                     "meta_width": 24, "meta_height": 24,
                     "meta_duration_ms": 0})
    # a non-image row must be ignored
    rows.append({"media_id": 99, "media_type": "audio", "payload": b"x",
                 "meta_width": 0, "meta_height": 0, "meta_duration_ms": 5})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (image_phash_neardup(ds, concurrency=(1, 2)).to_pandas()
           .set_index("media_id").sort_index())
    assert {0, 1, 2} <= set(out.index)  # the texture cluster found
    assert (out.loc[[0, 1, 2], "n_neighbors"] >= 2).all()
    assert (out.loc[[0, 1, 2], "min_hamming"] <= 12).all()
    assert 10 not in out.index and 11 not in out.index  # isolated
    assert 99 not in out.index


def test_media_phash_neardup_query_cluster_structure(ray_session):
    """The driver query's fixture packs clusters of three; every image
    must report both in-cluster neighbors (banding recall at these
    distances) and nothing cross-cluster at Hamming ≤ 3."""
    from pdf_to_text_ray.pipelines.queries import media_phash_neardup

    out = media_phash_neardup("/root/testdata/sf0.001").set_index("media_id")
    n_imgs = 184  # fixture rows for sf0.001 (ceil to clusters of 3)
    # every image finds its nearest in-cluster variant (base↔noise ≤ 4
    # bits, base↔resize ≤ ~10); the resize↔noise leg may legitimately
    # exceed max_hamming=12, so ≥ 2 neighbors holds for most but not
    # all rows
    assert len(out) >= 0.9 * n_imgs
    assert (out["n_neighbors"] >= 1).all()
    assert (out["n_neighbors"] >= 2).mean() > 0.5
    assert (out["min_hamming"] <= 12).all()
