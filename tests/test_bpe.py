"""Distributed BPE merge learning vs a local reference implementation
(the classic Counter loop from Sennrich et al. 2016, re-written here
independently as the test oracle)."""

import random
from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data as rd

from pdf_to_text_ray.stages.bpe import (
    END,
    apply_merges_to_word,
    learn_merges,
)


def _reference_bpe(texts: list[str], n_merges: int):
    """Single-process reference: word freqs → repeated best-pair merge
    with (count desc, pair lexicographic) tiebreak."""
    vocab: Counter = Counter()
    for t in texts:
        vocab.update(t.lower().split())
    words = {w: list(w) + [END] for w in vocab}
    merges = []
    for k in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((k, l, r, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return pd.DataFrame(merges,
                        columns=["merge_rank", "left", "right", "pair_count"])


def _texts(seed: int, n: int) -> list[str]:
    words = ("stream batch arrow block shuffle actor lineage schema "
             "parquet column the and merge scan filter").split()
    rng = random.Random(seed)
    return [" ".join(rng.choice(words) for _ in range(rng.randrange(5, 40)))
            for _ in range(n)]


def test_learn_merges_matches_reference(ray_session):
    texts = _texts(11, 120)
    ds = rd.from_arrow(pa.table({"text": texts}))
    got = learn_merges(ds, n_merges=10)
    want = _reference_bpe(texts, 10)
    pd.testing.assert_frame_equal(got, want)


def test_learn_merges_multiblock_invariant(ray_session):
    # partitioning must not change the learned table (algebraic partials)
    texts = _texts(12, 90)
    one = learn_merges(rd.from_arrow(pa.table({"text": texts})), n_merges=6)
    many = learn_merges(
        rd.from_arrow(pa.table({"text": texts})).repartition(13), n_merges=6)
    pd.testing.assert_frame_equal(one, many)


def test_apply_merges_roundtrip():
    merges = [("t", "h"), ("th", "e"), ("the", END)]
    assert apply_merges_to_word("the", merges) == ["the" + END]
    assert apply_merges_to_word("then", [("t", "h")]) == ["th", "e", "n", END]


def test_empty_and_degenerate(ray_session):
    ds = rd.from_arrow(pa.table({"text": ["", None, "x"]}))
    got = learn_merges(ds, n_merges=4)
    # single word "x" → the only pair (x, </w>) has count 1 < 2 → no merges
    assert got.empty


def test_bpe_token_counts_applies_learned_merges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pdf_to_text_ray.stages.bpe import (apply_merges_to_word,
                                            bpe_token_counts, learn_merges)

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["low lower lowest", "low low newer", ""],
                         pa.string()),
    })
    ds = rd.from_arrow(docs)
    merges = [tuple(r) for r in learn_merges(ds, n_merges=4)
              [["left", "right"]].itertuples(index=False)]
    out = (bpe_token_counts(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # reference: encode each word with the helper the stage broadcasts
    def n_tokens(s):
        return sum(len(apply_merges_to_word(w, merges))
                   for w in s.lower().split())
    assert out["n_bpe_tokens"].tolist() == [
        n_tokens("low lower lowest"), n_tokens("low low newer"), 0]
