"""Third batch of randomized equivalence properties: the window-free
global rank / prefix-sum primitives (vs the obvious sorted reference,
at several partition counts — these underpin many oracle queries),
MinHash-LSH soundness (reported pairs carry true Jaccard values;
identical shingle sets are ALWAYS found — that part of LSH recall is
deterministic), and distributed BPE training vs a sequential Python
reference (same tie-break, same greedy non-overlapping merge)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

rows_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(1, 100)),  # (sort value, weight)
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(rows=rows_strategy, nparts=st.sampled_from([1, 3, 7]))
def test_global_rank_and_cumsum_match_sorted_reference(
    spark_global, rows, nparts
):
    """global_rank == 1-based position in the totally-ordered sort and
    global_cumsum == the running sum at that position, independent of
    the partition count (1, 3, 7) — the no-WindowExec plans must not
    change answers with physical layout.  Rows get a unique id tiebreak
    so the order is total even with duplicate sort values."""
    from movie_recommendation_engine_spark.operators.relational import (
        global_cumsum,
        global_rank,
    )

    spark = spark_global
    data = [(i, v, w) for i, (v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id int, v int, w int")

    ref = sorted(data, key=lambda t: (t[1], t[0]))
    want_rank = {t[0]: i + 1 for i, t in enumerate(ref)}
    acc, want_cum = 0, {}
    for t in ref:
        acc += t[2]
        want_cum[t[0]] = acc

    got_rank = {
        r.id: r.rank
        for r in global_rank(df, ["v", "id"], num_partitions=nparts).collect()
    }
    got_cum = {
        r.id: r.cumsum
        for r in global_cumsum(
            df, ["v", "id"], "w", num_partitions=nparts
        ).collect()
    }
    assert got_rank == want_rank
    assert got_cum == want_cum


VOCAB = ["red", "blue", "green", "ship", "anchor"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=2, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


def _shingle_set(text: str, n: int) -> frozenset[str]:
    words = text.strip().lower().split()
    if len(words) < n:
        return frozenset([" ".join(words)])
    return frozenset(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))


@settings(max_examples=6, deadline=None)
@given(docs=docs_strategy, threshold=st.sampled_from([0.5, 0.9]))
def test_minhash_lsh_sound_and_complete_on_identical_docs(
    spark_global, docs, threshold
):
    """minhash_lsh_pairs soundness: every reported pair's jaccard is the
    true shingle-set Jaccard and clears the threshold; pairs are a
    subset of the brute-force result.  Completeness is probabilistic in
    general but DETERMINISTIC for identical shingle sets (identical
    signatures share every band), so jaccard-1.0 pairs must always be
    reported."""
    from movie_recommendation_engine_spark.operators.dedup import minhash_lsh_pairs

    spark = spark_global
    df = spark.createDataFrame(list(enumerate(docs)), "id int, body string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            df, "id", "body", n=2, threshold=threshold
        ).collect()
    }

    sets = {i: _shingle_set(t, 2) for i, t in enumerate(docs)}
    import itertools

    true_j = {
        (a, b): len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        for a, b in itertools.combinations(sorted(sets), 2)
    }
    for pair, j in got.items():
        assert abs(j - true_j[pair]) < 1e-6, (pair, j, true_j[pair])
        assert j >= threshold
    for pair, j in true_j.items():
        if j == 1.0:
            assert pair in got, (pair, docs[pair[0]], docs[pair[1]])


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sequential reference BPE: most-frequent pair with
    (count desc, left asc, right asc) tie-break, greedy left-to-right
    non-overlapping merge — the semantics bpe.py distributes."""
    state = {w: [list(w), f] for w, f in word_freqs.items()}
    steps = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in state.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        (left, right), n = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        for w, (syms, f) in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w][0] = out
        corpus_len = sum(f * len(syms) for syms, f in state.values())
        vocab = len({s for syms, _ in state.values() for s in syms})
        steps.append((step, left, right, n, corpus_len, vocab))
    return steps, state


bpe_docs_strategy = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(docs=bpe_docs_strategy)
def test_bpe_train_matches_sequential_reference(spark_global, docs):
    """Distributed BPE training (merge table AND per-word final symbol
    sequences) equals the sequential reference on any corpus — the
    gaps-and-islands even-offset merge really is greedy left-to-right,
    and the top-1 tie-break matches.  An 8-char anchor word keeps at
    least one adjacent pair alive through all 3 merge rounds."""
    from movie_recommendation_engine_spark.operators.bpe import bpe_train_state

    docs = docs + ["abababab"]
    spark = spark_global
    df = spark.createDataFrame([(d,) for d in docs], "body string")
    merges, state = bpe_train_state(df, "body", n_merges=3)
    got_steps = [
        (r.step, r.left, r.right, r.pair_count, r.corpus_len_after, r.vocab_after)
        for r in merges.orderBy("step").collect()
    ]
    got_state = {r.word: list(r.syms) for r in state.collect()}

    wf: Counter = Counter(w for d in docs for w in d.split())
    want_steps, want_state = _ref_bpe(dict(wf), 3)
    assert got_steps == want_steps
    assert got_state == {w: syms for w, (syms, _) in want_state.items()}
