"""BPE vocabulary induction vs an independent pure-Python reference
implementation (Sennrich et al. 2016 algorithm 1, same deterministic
tie-break: max count, then lexicographic pair)."""

import collections

import pytest

from kineo_spark.pipeline import bpe

END = bpe.END


def _ref_bpe(corpus: list[str], n_merges: int):
    words = collections.Counter()
    for doc in corpus:
        for w in doc.lower().split():
            words[w] += 1
    syms = {w: [*w[:-1], w[-1] + END] for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, f in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    vocab = collections.Counter()
    for w, f in words.items():
        for s in syms[w]:
            vocab[s] += f
    return merges, dict(vocab)


CORPUS = [
    "the slow river flows slowly past the low stone tower",
    "lower and lower the slow water runs past the tower",
    "newest stones rest below the lowest tower walls",
    "the newest walls stand lower than the oldest stones",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    want_merges, want_vocab = _ref_bpe(CORPUS, 12)
    got_merges = bpe.bpe_train(df, n_merges=12)
    assert got_merges == want_merges
    got_vocab = {r.symbol: r.freq for r in bpe.bpe_vocab(df, n_merges=12).collect()}
    assert got_vocab == want_vocab


def test_bpe_encode_greedy_rank_order(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    merges = bpe.bpe_train(df, n_merges=8)
    enc = bpe.bpe_encode(df, merges).collect()
    for row in enc:
        # pieces reassemble to the original words (with end sentinels)
        joined = "".join(row.pieces).replace(END, " ").strip()
        assert joined == " ".join(row.text.lower().split())
        # every piece is a known symbol: single char(+END) or a merge product
        products = {a + b for a, b in merges}
        for p in row.pieces:
            assert p in products or len(p.replace(END, "")) == 1
