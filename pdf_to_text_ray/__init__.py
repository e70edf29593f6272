"""pdf_to_text_ray — a Ray-Data-native document→text extraction engine.

A from-scratch reimplementation of the capabilities of
``pierotech/pdf-to-text`` (reference at /root/reference, a Cloudflare
Worker that converts one uploaded PDF per HTTP request into text, blocks
and records), generalized to a streaming ``ray.data.Dataset`` job over
Common-Crawl-style page tables:

- content sniffing (PDF magic bytes vs HTML vs plain text)
- a from-scratch PDF parser (xref tables + xref streams, object streams,
  FlateDecode, content-stream tokenization, reading-order reconstruction)
- a from-scratch HTML boilerplate stripper (tokenizer, tree, text/link
  density scoring)
- the reference's block segmenter + deterministic record extractor
  (reference: src/main.ts:70-109, 39-56)
- web-scale training-data ops: exact/MinHash/SimHash dedup, embedding
  similarity search, text quality analysis
- partitioned, resumable Parquet output with per-partition manifests.

No stage calls ``ray.init()``; the caller owns the Ray session.
"""

__version__ = "0.1.0"

# normalize Ray's zero-column empty-partition bundles to the declared
# operator schema (see _raypatch docstring) — safe no-op if internals move
from . import _raypatch as _raypatch  # noqa: E402,F401
