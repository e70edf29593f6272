"""Distributed BPE merge learning (Sennrich, Haddow & Birch 2016 —
"Neural Machine Translation of Rare Words with Subword Units").

The tokenizer-training half the BPE-ish *counter* (analysis.py) leaves
out: learn the merge table itself from the corpus. Shape for scale:

1. ONE distributed word-count (per-batch Counter partials → a
   payload-free ``groupby(word).sum`` — the classic combiner shape);
   every later pass runs over the word-frequency table, which is
   orders of magnitude smaller than the corpus and never grows.
2. Per merge round: per-batch adjacent-pair partial counts over the
   symbolized vocab (weighted by word freq) → ``groupby(pair).sum`` →
   per-block top-1 → the driver reduces ≤ #blocks candidates to the
   global argmax (count desc, then lexicographic pair — fully
   deterministic). Only (pair, count) triples ever shuffle.
3. The winning pair is broadcast in the merge closure; a map_batches
   pass rewrites the vocab's symbol strings in place. The vocab is
   re-materialized per round so round k+1 does not re-execute rounds
   1..k (lineage would re-run the whole chain lazily).

Partitioning assumption: none beyond Ray's default — the vocab table
is hash-partitioned arbitrarily; pair counting is algebraic
(commutative partials), so block layout cannot change the result.

Symbol sequences travel as a single utf-8 string column with U+0000
separators (Arrow-native, no nested lists in the shuffle); words end
with the classic "</w>" marker so end-of-word merges stay distinct.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

SEP = "\x00"
END = "</w>"


def word_count_ds(ds, text_col: str = "text"):
    """Corpus → (word, n) Dataset via combiner-shaped partial counts."""
    def part(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t[text_col].to_pylist():
            c.update((s or "").lower().split())
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return ds.map_batches(part, batch_format="pyarrow").groupby("word").sum("n")


def _symbolize(t: pa.Table) -> pa.Table:
    syms = [SEP.join(list(w) + [END]) for w in t["word"].to_pylist()]
    return pa.table({"sym": pa.array(syms, pa.string()),
                     "n": t["sum(n)"] if "sum(n)" in t.column_names else t["n"]})


def _pair_partials(t: pa.Table) -> pa.Table:
    from collections import Counter

    c: Counter = Counter()
    ns = t["n"].to_pylist()
    for sym, n in zip(t["sym"].to_pylist(), ns):
        parts = sym.split(SEP)
        for a, b in zip(parts, parts[1:]):
            c[(a, b)] += n
    if not c:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    ls, rs = zip(*c.keys())
    return pa.table({"left": pa.array(list(ls), pa.string()),
                     "right": pa.array(list(rs), pa.string()),
                     "c": pa.array(list(c.values()), pa.int64())})


def _block_top1(t: pa.Table) -> pa.Table:
    df = t.to_pandas()
    if df.empty:
        return t
    df = df.sort_values(["c", "left", "right"],
                        ascending=[False, True, True], kind="stable")
    return pa.Table.from_pandas(df.head(1), preserve_index=False)


def learn_merges(ds, n_merges: int = 8, text_col: str = "text") -> pd.DataFrame:
    """→ DataFrame(merge_rank, left, right, pair_count), the learned
    merge table in application order."""
    vocab = word_count_ds(ds, text_col).map_batches(
        _symbolize, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        tops = (vocab.map_batches(_pair_partials, batch_format="pyarrow")
                .groupby(["left", "right"]).sum("c")
                .map_batches(lambda t: _block_top1(
                    t.rename_columns(["left", "right", "c"])),
                    batch_format="pyarrow")
                .to_pandas())
        if tops.empty:
            break
        tops = tops.sort_values(["c", "left", "right"],
                                ascending=[False, True, True], kind="stable")
        left, right, cnt = (tops["left"].iloc[0], tops["right"].iloc[0],
                            int(tops["c"].iloc[0]))
        if cnt < 2:
            break  # nothing left worth merging
        merges.append((k, left, right, cnt))
        pat, rep = left + SEP + right, left + right

        def apply_merge(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            # U+0000-joined symbols make the pair merge a plain string
            # replace — but only where the match is symbol-aligned,
            # which the separators guarantee by construction
            syms = [_merge_sym(s, pat, rep) for s in t["sym"].to_pylist()]
            return pa.table({"sym": pa.array(syms, pa.string()), "n": t["n"]})

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame(merges,
                        columns=["merge_rank", "left", "right", "pair_count"])


def _merge_sym(sym: str, pat: str, rep: str) -> str:
    """Merge non-overlapping left-to-right occurrences of ``pat`` (a
    SEP-joined symbol pair) that start and end on symbol boundaries."""
    if pat not in sym:
        return sym
    parts = sym.split(SEP)
    l, r = pat.split(SEP)
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == l and parts[i + 1] == r:
            out.append(rep)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return SEP.join(out)


def apply_merges_to_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge table (test/serving
    helper; greedy in merge-table order, as in the paper)."""
    sym = SEP.join(list(word) + [END])
    for left, right in merges:
        sym = _merge_sym(sym, left + SEP + right, left + right)
    return sym.split(SEP)


def text_token_counter(merges: list[tuple[str, str]]):
    """Memoized text → BPE-token-count closure — THE single encode
    convention (lower().split() words, per-distinct-word memo) shared
    by bpe_token_counts and lang_token_fertility so the tokenization
    cannot drift between the per-doc and per-lang metrics."""
    memo: dict[str, int] = {}

    def count(s: str | None) -> int:
        n = 0
        for w in (s or "").lower().split():
            c = memo.get(w)
            if c is None:
                c = len(apply_merges_to_word(w, merges))
                memo[w] = c
            n += c
        return n

    return count


def bpe_token_counts(ds, merges: list[tuple[str, str]], *,
                     key_col: str = "doc_id", text_col: str = "text"):
    """Apply a LEARNED merge table corpus-wide → (key, n_bpe_tokens).

    The serving half of the BPE loop (learn_merges is the training
    half): the merge table — tiny by construction — is broadcast once
    via ray.put; each batch tokenizes its DISTINCT words once (word
    memo: web text repeats words heavily) and sums token counts per
    document. One streaming pass, no shuffle."""
    import ray

    ref = ray.put(list(merges))

    def encode(t: pa.Table) -> pa.Table:
        import ray as _ray

        count = text_token_counter(_ray.get(ref))
        counts = [count(s) for s in t[text_col].to_pylist()]
        return pa.table({key_col: t[key_col],
                         "n_bpe_tokens": pa.array(counts, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")
