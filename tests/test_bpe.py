"""BPE tokenizer training: distributed == sequential reference."""

from __future__ import annotations

import collections

from movie_recommendation_engine_spark.operators.bpe import bpe_train


def _ref_bpe(texts: list[str], n: int):
    """Sequential BPE with the operator's exact semantics: overlap-
    inclusive pair counting, (count DESC, left, right) tiebreak, greedy
    left-to-right non-overlapping merge application."""
    wf = collections.Counter(w for t in texts for w in t.lower().split() if w)
    state = {w: list(w) for w in wf}
    out = []
    for step in range(1, n + 1):
        pc: collections.Counter = collections.Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in state.items():
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    new.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            state[w] = new
        corpus = sum(wf[w] * len(s) for w, s in state.items())
        vocab = len({s for ss in state.values() for s in ss})
        out.append((step, l, r, c, corpus, vocab))
    return out


def test_bpe_matches_sequential_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
        "widest aaaa aabab banana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = [tuple(r) for r in bpe_train(df, "text", 6).orderBy("step").collect()]
    assert got == _ref_bpe(texts, 6)


def test_bpe_greedy_nonoverlapping_runs(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa) — two merges, not
    three overlapping candidates; odd runs keep the tail: 'aaa' ->
    (aa)a."""
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id int, text string")
    rows = bpe_train(df, "text", 1).collect()
    assert [(r.left, r.right, r.pair_count) for r in rows] == [("a", "a", 5)]
    # corpus after: aaaa -> 2 symbols, aaa -> 2 symbols (aa + a)
    assert rows[0].corpus_len_after == 4
    assert rows[0].vocab_after == 2  # {'aa', 'a'}


def test_bpe_single_char_words_survive(spark):
    """Length-1 words have no pairs but must stay in the state (their
    frequency still counts toward corpus length)."""
    df = spark.createDataFrame([(1, "a b ab ab")], "doc_id int, text string")
    rows = bpe_train(df, "text", 1).collect()
    assert [(r.left, r.right) for r in rows] == [("a", "b")]
    # words: a(1 sym), b(1 sym), ab -> merged to 1 sym, freq 2
    assert rows[0].corpus_len_after == 1 + 1 + 2 * 1


def test_bpe_encode_applies_trained_state(spark):
    from movie_recommendation_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_train_state,
    )

    df = spark.createDataFrame(
        [(1, "low low lowest"), (2, "low slow")], "doc_id int, text string"
    )
    _, state = bpe_train_state(df, "text", 2)
    enc = {r.doc_id: r for r in bpe_encode(df, "doc_id", "text", state).collect()}
    # chars never change; bpe tokens shrink monotonically with merges
    assert enc[1].n_words == 3 and enc[1].n_chars == len("lowlowlowest")
    assert enc[1].n_bpe_tokens < enc[1].n_chars
    assert enc[2].n_words == 2
    # every word's token count = len of its trained symbol sequence
    st = {r.word: len(r.syms) for r in state.collect()}
    assert enc[2].n_bpe_tokens == st["low"] + st["slow"]


def test_bpe_encode_oov_words_fall_back_to_chars_not_dropped(spark):
    """Serving a DIFFERENT corpus: out-of-vocabulary words count as
    character-level tokens via the left join's fallback — the old inner
    join undercounted n_words/n_chars and dropped all-OOV documents
    entirely (round-5 review)."""
    from movie_recommendation_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_train_state,
    )

    train = spark.createDataFrame([("low lower",)], "text string")
    _, state = bpe_train_state(train, "text", n_merges=2)
    serve = spark.createDataFrame(
        [(1, "low unseen"), (2, "zzz qqq")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in bpe_encode(serve, "doc_id", "text", state).collect()}
    assert set(out) == {1, 2}  # the all-OOV doc 2 is present
    assert out[1].n_words == 2 and out[1].n_chars == len("low") + len("unseen")
    # OOV fallback: 'unseen' contributes one token per char
    in_vocab_syms = out[1].n_bpe_tokens - len("unseen")
    assert 1 <= in_vocab_syms <= len("low")
    assert out[2].n_bpe_tokens == out[2].n_chars == 6
