"""Deterministic synthetic-HTML generator with golden text by construction.

Each generated page carries boilerplate (head cruft, link-dense nav /
aside / footer, script+style bodies that must not leak) around one
main-content container whose block texts are chosen first; the expected
extracted text is therefore known by construction:
``"\\n".join(blocks)`` per the pinned spec (FIXTURES.md §2).

Seeded ``random.Random`` only — no wall clock, no external data.
"""

from __future__ import annotations

import html as _htmlmod
import random

_WORDS = (
    "data stream batch arrow block shuffle actor lineage schema parquet "
    "column vector record pipeline worker cluster spill object store task "
    "metric page text token shard index merge scan filter project group"
).split()

_ES_WORDS = (
    "datos flujo lote bloque columna registro canal obrero grupo filtro "
    "indice mezcla pagina texto ficha tarea metrica esquema tabla fila"
).split()

# entity spots: (entity-source, decoded-char)
_ENTITIES = [("&amp;", "&"), ("&#233;", "\xe9"), ("&lt;", "<"), ("&quot;", '"'),
             ("&#xE9;", "\xe9")]


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    ws = [rng.choice(words) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def make_sucursal_block_lines(rng: random.Random, terminated: bool = True,
                              mixed_case: bool = False) -> list[str]:
    """Lines of one reference-shaped sales block (FIXTURES.md §3)."""
    name = f"{rng.randrange(1, 9999):04d} - {rng.choice(_WORDS).capitalize()}"
    head = ("sUcursal " if mixed_case else "Sucursal ") + name
    lines = [head]
    total = 0.0
    for _ in range(rng.randrange(0, 4)):
        ean = "".join(rng.choice("0123456789") for _ in range(13))
        qty = rng.randrange(1, 9)
        price = rng.randrange(100, 9999) / 100.0
        amount = round(qty * price, 2)
        total += amount
        lines.append(f"{ean} {qty} {amount:.2f}")
    if terminated:
        marker = ("* TOTAL IMPORTE EN LA SUCURSAL: " if mixed_case
                  else "* Total importe en la sucursal: ")
        lines.append(f"{marker}{total:.2f}")
    return lines


def _escape_block(rng: random.Random, text: str) -> tuple[str, str]:
    """Optionally embed an entity: returns (markup_text, decoded_text)."""
    if rng.random() < 0.3:
        src, dec = rng.choice(_ENTITIES)
        markup = _htmlmod.escape(text[:-1]) + " " + src + "."
        decoded = text[:-1] + " " + dec + "."
        return markup, decoded
    return _htmlmod.escape(text), text


# charset → (meta label, python codec, marker sentence whose chars are
# encodable in that charset). The marker paragraph lands in the main
# content, so the golden text proves the decode actually happened
# (mojibake or U+FFFD would break byte-identity).
_CHARSETS: dict[str, tuple[str, str, str]] = {
    "utf-8": ("utf-8", "utf-8", ""),
    "utf-8-bom": ("utf-8", "utf-8", "Ünïcode bøm marker — déjà vu."),
    "cp1252": ("windows-1252", "cp1252", "Café déjà vu — naïve façade über niño."),
    "iso8859-15": ("iso-8859-15", "iso8859-15", "Paiement de 10 € à Paris, idée reçue."),
    "shift_jis": ("shift_jis", "shift_jis", "日本語のテキスト行です。"),
    "gbk": ("gb2312", "gbk", "中文网页正文内容。"),
    "utf-16-le": ("utf-16", "utf-16-le", "Úñïçødé テキスト 中文 body."),
}


def make_html_page(rng: random.Random, lang: str = "en",
                   with_sucursal: bool = False,
                   malformed: bool = False,
                   heavy: bool = False,
                   charset: str = "utf-8") -> tuple[bytes, str]:
    """Returns (html_bytes, expected_main_text). ``heavy`` pages carry
    ~10x the content (bench corpora, so per-doc work dominates
    scheduling overhead in scaling measurements). ``charset`` encodes
    the page in a legacy web encoding (declared via its WHATWG meta
    label, or BOM for utf-16/utf-8-bom) — the golden text is the same
    unicode either way, so extraction byte-identity proves the
    WHATWG-ordered charset resolution (stages/charset.py)."""
    words = _ES_WORDS if lang == "es" else _WORDS
    meta_label, codec, marker = _CHARSETS[charset]

    # 1) choose main-content blocks first (the golden truth)
    blocks_markup: list[str] = []
    blocks_text: list[str] = []

    title = _sentence(rng, words, rng.randrange(3, 6))[:-1]
    blocks_markup.append(f"<h1>{_htmlmod.escape(title)}</h1>")
    blocks_text.append(title)

    n_paras = rng.randrange(30, 55) if heavy else rng.randrange(3, 8)
    for _ in range(n_paras):
        para = " ".join(
            _sentence(rng, words, rng.randrange(6, 14))
            for _ in range(rng.randrange(2, 5))
        )
        markup, decoded = _escape_block(rng, para)
        if malformed and rng.random() < 0.5:
            blocks_markup.append(f"<p>{markup}")  # unclosed; implicit close
        else:
            blocks_markup.append(f"<p>{markup}</p>")
        blocks_text.append(decoded)

    if rng.random() < 0.4:
        items = [_sentence(rng, words, rng.randrange(2, 5))[:-1]
                 for _ in range(rng.randrange(2, 5))]
        blocks_markup.append(
            "<ul>" + "".join(f"<li>{_htmlmod.escape(i)}</li>" for i in items) + "</ul>")
        blocks_text.extend(items)

    if malformed:
        frag = f"x {rng.randrange(10)} < {rng.randrange(10)} y"
        blocks_markup.append(f"<p>{frag}</p>")  # stray '<' followed by space
        blocks_text.append(frag)

    if marker:
        blocks_markup.append(f"<p>{_htmlmod.escape(marker)}</p>")
        blocks_text.append(marker)

    if with_sucursal:
        lines = make_sucursal_block_lines(rng, terminated=rng.random() > 0.15,
                                          mixed_case=rng.random() < 0.2)
        if rng.random() < 0.5:
            # sales block as real preformatted text: <pre> preserves
            # line structure (one block per line, pinned spec)
            blocks_markup.append(
                "<pre>" + "\n".join(_htmlmod.escape(l) for l in lines) + "</pre>")
        else:
            for line in lines:
                blocks_markup.append(f"<p>{_htmlmod.escape(line)}</p>")
        blocks_text.extend(lines)

    # 2) boilerplate (link-dense; must be stripped)
    nav_links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(words, 6))
    aside_links = "".join(
        f'<li><a href="/{w}">{w} {rng.randrange(100)}</a></li>'
        for w in rng.sample(words, 4))
    # cross-host outlinks (boilerplate → never in golden text) give the
    # extracted link graph real inter-host edges for host-level graph
    # analytics (host_link_summary, host_pagerank)
    partner_links = "".join(
        f'<a href="https://ex{rng.randrange(40)}.test/{w}">{w} hub</a> '
        for w in rng.sample(words, 2))
    footer = (
        f'<p>© {rng.randrange(2010, 2026)} example — {partner_links}'
        f'<a href="/terms">terms</a> <a href="/privacy">privacy</a></p>')
    script_body = f"var x = {rng.randrange(1000)}; function f() {{ return '<p>leak</p>'; }}"
    style_body = "body { margin: 0; } .content p { color: #222; }"

    # meta declaration style varies like the real web: plain charset
    # attr or the older http-equiv content-type form
    if rng.random() < 0.3:
        meta = ('<meta http-equiv="Content-Type" '
                f'content="text/html; charset={meta_label}">')
    else:
        meta = f'<meta charset="{meta_label}">'
    doc = (
        "<!DOCTYPE html>\n"
        f'<html lang="{lang}"><head>\n'
        f"<title>{_htmlmod.escape(title)} — site</title>\n"
        f'{meta}<link rel="stylesheet" href="/s.css">\n'
        f"<style>{style_body}</style>\n"
        f"<script>{script_body}</script>\n"
        "</head><body>\n"
        f'<header><div class="logo">site</div><nav>{nav_links}</nav></header>\n'
        f'<aside class="sidebar"><ul>{aside_links}</ul></aside>\n'
        f'<article class="content">\n' + "\n".join(blocks_markup) + "\n</article>\n"
        f"<footer>{footer}</footer>\n"
        "</body></html>\n"
    )
    if charset == "utf-16-le":
        # BOM-prefixed UTF-16LE body: BOM wins over the meta label
        # (WHATWG order), which is why the label above says utf-16
        return b"\xff\xfe" + doc.encode("utf-16-le"), "\n".join(blocks_text)
    if charset == "utf-8-bom":
        return b"\xef\xbb\xbf" + doc.encode("utf-8"), "\n".join(blocks_text)
    # unencodable chars (e.g. the em-dash in the title under shift_jis)
    # become numeric character references, exactly like real legacy
    # sites emitted them — the parser decodes them back, goldens hold
    return doc.encode(codec, errors="xmlcharrefreplace"), "\n".join(blocks_text)
