"""BPE training + tokenization (late r6): learned merges vs an
independent naive oracle, reconstruction invariant, distributed
training equals local training on the same corpus."""

import pytest

from trefoil_spark.operators.bpe import (
    END,
    bpe_segment_word,
    bpe_tokenize,
    learn_bpe,
    train_bpe,
)

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest newest newest newest newest"),
    (2, "widest widest widest new new"),
]


def _naive_bpe(word_freqs, n_merges):
    """Independent oracle: textbook implementation with explicit
    string-keyed vocab (different data layout from learn_bpe)."""
    vocab = {" ".join(list(w) + [END]): c for w, c in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for spaced, c in vocab.items():
            syms = spaced.split(" ")
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        find = " ".join(best)
        repl = "".join(best)
        vocab = {
            _replace_pair(spaced, find, repl): c
            for spaced, c in vocab.items()
        }
    return merges


def _replace_pair(spaced, find, repl):
    toks = spaced.split(" ")
    out = []
    i = 0
    fa, fb = find.split(" ")
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == fa and toks[i + 1] == fb:
            out.append(repl)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return " ".join(out)


def _py_word_freqs(corpus):
    wf = {}
    for _, t in corpus:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))


def test_learn_matches_naive_oracle():
    wf = _py_word_freqs(CORPUS)
    for n in (1, 5, 12, 50):
        assert learn_bpe(wf, n) == _naive_bpe(wf, n)


def test_train_bpe_distributed_equals_local(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    got = train_bpe(df, n_merges=10)
    want = learn_bpe(_py_word_freqs(CORPUS), 10)
    assert got == want
    # the classic example's first merges involve the 'est'/'newest'
    # family (6 x newest dominates)
    assert got[0][0] in ("e", "s", "t", "n") or got[0][1] == END


def test_segment_reconstruction_invariant():
    wf = _py_word_freqs(CORPUS)
    merges = learn_bpe(wf, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in wf:
        seg = bpe_segment_word(w, ranks)
        assert "".join(seg) == w + END


def test_bpe_tokenize_spark(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    merges = train_bpe(df, n_merges=10)
    rows = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for did, text in CORPUS:
        want = []
        for w in text.lower().split():
            want.extend(bpe_segment_word(w, ranks))
        assert list(rows[did]["tokens"]) == want
        assert rows[did]["n_bpe_tokens"] == len(want)
    # high-frequency words compress: 'newest' (x6) must be <= 2 tokens
    seg = bpe_segment_word("newest", ranks)
    assert len(seg) <= 2
