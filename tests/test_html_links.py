"""Hyperlink-graph + page-metadata extraction (stages/html_links.py).

Exact-edge assertions on handcrafted HTML, fixture-page invariants
(every generated page carries the footer terms/privacy links resolved
against its own host), and the Ray pipeline path end-to-end.
"""

import pyarrow as pa
import pytest

from pdf_to_text_ray.stages.html_links import (
    extract_links,
    extract_page_meta,
    links_batch,
    normalize_url,
    page_meta_batch,
    resolve_href,
)

DOC = """<!DOCTYPE html><html lang="es"><head>
<title>Mi &amp; Pagina - site</title>
<meta name="description" content="una   descripcion">
<link rel="canonical" href="https://ex0.test/p1">
<script>var x = 1; // <a href="/fake">not a link</a></script>
</head><body>
<header><nav><a href="/home">Home</a> <a href="/about">About <b>us</b></a></nav></header>
<h1>Head</h1>
<p>body <a href="https://other.test/x#frag" rel="nofollow">ext &gt; link</a>
<a href="mailto:a@b.c">mail</a> <a href="#top">top</a>
<a href="javascript:void(0)">js</a> <a href="p2?q=1">rel</a></p>
<footer><a href="/terms">terms</a></footer></body></html>"""


def test_resolve_href():
    base = "https://ex0.test/dir/page"
    assert resolve_href(base, "/abs") == "https://ex0.test/abs"
    assert resolve_href(base, "sib") == "https://ex0.test/dir/sib"
    assert resolve_href(base, "../up") == "https://ex0.test/up"
    assert resolve_href(base, "https://B.test/P#f") == "https://b.test/P"
    assert resolve_href(base, "#frag") is None
    assert resolve_href(base, "mailto:x@y.z") is None
    assert resolve_href(base, "javascript:f()") is None
    assert resolve_href(base, "  ") is None


def test_normalize_url():
    assert normalize_url("HTTPS://Ex0.Test") == "https://ex0.test/"
    assert normalize_url("ftp://x.test/f") is None
    assert normalize_url("https://h.test/p?a=1#f") == "https://h.test/p?a=1"


def test_extract_links_exact():
    links = extract_links(DOC, "https://ex0.test/p1")
    assert [(l["dst_url"], l["anchor"], l["rel"], l["is_nav"],
             l["is_internal"]) for l in links] == [
        ("https://ex0.test/home", "Home", "", True, True),
        ("https://ex0.test/about", "About us", "", True, True),
        ("https://other.test/x", "ext > link", "nofollow", False, False),
        ("https://ex0.test/p2?q=1", "rel", "", False, True),
        ("https://ex0.test/terms", "terms", "", True, True),
    ]


def test_extract_page_meta_exact():
    m = extract_page_meta(DOC)
    assert m["title"] == "Mi & Pagina - site"
    assert m["html_lang"] == "es"
    assert m["meta_description"] == "una descripcion"
    assert m["canonical"] == "https://ex0.test/p1"
    assert m["n_links"] == 8  # raw <a href> count, pre-resolution
    assert m["n_headings"] == 1
    assert m["n_scripts"] == 1


def test_meta_missing_fields():
    m = extract_page_meta("<p>no head</p>")
    assert m["title"] == "" and m["html_lang"] == ""
    assert m["n_links"] == 0


def test_fixture_pages_carry_footer_links():
    import random

    from pdf_to_text_ray.fixtures.htmlgen import make_html_page

    rng = random.Random(7)
    html, _ = make_html_page(rng, lang="es")
    base = "https://ex3.test/p21"
    links = extract_links(html.decode("utf-8"), base)
    dsts = {l["dst_url"] for l in links}
    assert "https://ex3.test/terms" in dsts
    assert "https://ex3.test/privacy" in dsts
    # relative links resolve internal; the footer carries two absolute
    # cross-host partner links (the host-graph edges)
    ext = [l for l in links if not l["is_internal"]]
    assert len(ext) == 2
    assert all(l["dst_url"].startswith("https://ex") for l in ext)
    assert all(l["is_nav"] for l in links
               if l["dst_url"].endswith(("terms", "privacy")))
    meta = extract_page_meta(html.decode("utf-8"))
    assert meta["title"].endswith("— site")
    assert meta["html_lang"] == "es"


def test_batch_fns_route_non_html():
    t = pa.table({
        "url": ["https://a.test/h", "https://a.test/pdf", "https://a.test/txt"],
        "html": [DOC.encode("utf-8"), b"%PDF-1.4 stub", b"plain words"],
    })
    edges = links_batch(t)
    assert edges.num_rows == 5
    assert set(edges["src_url"].to_pylist()) == {"https://a.test/h"}
    meta = page_meta_batch(t)
    assert meta.num_rows == 1
    assert meta["url"].to_pylist() == ["https://a.test/h"]


def test_links_batch_empty():
    t = pa.table({"url": pa.array([], pa.string()),
                  "html": pa.array([], pa.binary())})
    out = links_batch(t)
    assert out.num_rows == 0
    assert out.schema.names == ["src_url", "dst_url", "anchor", "rel",
                                "is_nav", "is_internal"]


def test_pipeline_end_to_end(ray_session):
    import ray.data as rd

    from pdf_to_text_ray.fixtures.corpus import make_pages_table

    pages, _ = make_pages_table(40, seed=11)
    ds = rd.from_arrow(pages.select(["url", "html"]))
    edges = ds.map_batches(links_batch, batch_format="pyarrow").to_pandas()
    # fixture HTML pages always carry header nav + footer links,
    # including cross-host partner links
    assert len(edges) > 0
    assert edges["is_internal"].any() and (~edges["is_internal"]).any()
    meta = ds.map_batches(page_meta_batch, batch_format="pyarrow").to_pandas()
    assert 0 < len(meta) <= len(pages)
    assert (meta["n_links"] >= 2).all()
    # one metadata row per HTML input row (the pages table includes
    # deliberate stale-duplicate urls, so count rows, not unique urls)
    from pdf_to_text_ray.stages.html_links import _decode_html

    n_html = sum(_decode_html(p) is not None
                 for p in pages["html"].to_pylist())
    assert len(meta) == n_html


def test_truncated_gzip_and_deep_nesting_do_not_crash_batch():
    """Crash-robustness: a gzip payload cut mid-stream (EOFError, not
    OSError) and a pathologically nested page (RecursionError in the
    tree walk) must each skip the ROW, not kill the task."""
    import gzip

    import pyarrow as pa

    from pdf_to_text_ray.stages.html_links import links_batch, page_meta_batch

    good = b"<html><body><a href='/x'>ok</a></body></html>"
    truncated = gzip.compress(good * 50)[:40]  # mid-member cut
    deep = (b"<html><body>" + b"<div>" * 5000 + b"hi" + b"</div>" * 5000
            + b"</body></html>")
    t = pa.table({
        "url": ["http://a.example/1", "http://a.example/2",
                "http://a.example/3"],
        "html": pa.array([good, truncated, deep], pa.binary()),
    })
    links = links_batch(t)
    assert set(links["src_url"].to_pylist()) == {"http://a.example/1"}
    meta = page_meta_batch(t)
    assert "http://a.example/2" not in meta["url"].to_pylist()


def test_self_closing_non_void_anchor_keeps_text():
    """HTML5: '<a .../>' is an OPEN anchor — its following text is the
    anchor text (honoring the slash emptied anchors on real markup)."""
    from pdf_to_text_ray.stages.html_links import extract_links

    out = extract_links("<html><body><a href='/x'/>anchor text</a>"
                        "</body></html>", "http://h.example/")
    assert len(out) == 1 and out[0]["anchor"] == "anchor text"
