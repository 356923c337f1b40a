"""BPE tokenizer training + application (late r6) — Sennrich et al.
2016, the byte-pair-encoding algorithm behind GPT-2-family tokenizers.

Scale shape: classic BPE learns merges from the WORD-FREQUENCY table,
not the raw corpus — so the distributed part is exactly one
aggregation (corpus → distinct words + counts, one shuffle), capped to
the top-K words (a bounded, documented driver collect: 100k (word,
count) rows ≈ a few MB — the same bound sentencepiece uses). The merge
loop then runs driver-side on that compact table, and the learned
merge ranks broadcast back for executor-side tokenization (Arrow
batches, per-batch word cache so each distinct word is segmented
once).

Determinism: ties in pair counts break on the lexicographically
smallest pair, so the learned merges are a pure function of the word
frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bpe", "learn_bpe", "bpe_tokenize", "bpe_segment_word"]

END = "</w>"


def _word_freqs(docs: DataFrame, text_col: str, top_words: int):
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    wf = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(top_words)
    )
    # bounded driver collect: top_words rows of (word, count)
    return [(r["w"], r["c"]) for r in wf.collect()]


def learn_bpe(word_freqs: list, n_merges: int) -> list:
    """[(word, count)] → ordered merge list [(sym_a, sym_b), ...].
    Pure python, deterministic (count desc, then lexicographic pair)."""
    vocab = {}
    for w, c in word_freqs:
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(docs: DataFrame, n_merges: int = 200,
              text_col: str = "text", top_words: int = 100_000) -> list:
    """Learn BPE merges from a corpus: one word-count shuffle, bounded
    top-K collect, driver-side merge loop (see module note)."""
    return learn_bpe(_word_freqs(docs, text_col, top_words), n_merges)


def bpe_segment_word(word: str, ranks: dict) -> list:
    """Segment one word with learned merge ranks (greedy lowest-rank
    merge first — the standard application order)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(docs: DataFrame, merges: list, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """docs → (id, tokens array<string>, n_bpe_tokens). The merge list
    rides to executors via UDF closure (≈n_merges tuples — KBs);
    each Arrow batch caches segmentations per distinct word."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches):
        cache: dict = {}
        for pdf in batches:
            toks_out = []
            for text in pdf[text_col]:
                toks = []
                for w in (text or "").lower().split():
                    seg = cache.get(w)
                    if seg is None:
                        seg = bpe_segment_word(w, ranks)
                        cache[w] = seg
                    toks.extend(seg)
                toks_out.append(toks)
            out = pdf[[id_col]].copy()
            out["tokens"] = toks_out
            out["n_bpe_tokens"] = [len(t) for t in toks_out]
            yield out

    return docs.mapInPandas(
        gen,
        schema=f"{id_col} bigint, tokens array<string>, n_bpe_tokens int",
    )
