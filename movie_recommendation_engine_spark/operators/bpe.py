"""Distributed byte-pair-encoding (BPE) tokenizer training.

The vocabulary-learning step of an LLM data pipeline: iteratively find
the most frequent adjacent symbol pair in the corpus and merge it into
a new symbol, yielding the merge table a tokenizer ships with
(Sennrich et al. 2016; GPT-2 trains the same way over word
frequencies).

Scale shape — everything is per-word-bounded or corpus-aggregated:

- training runs over the DISTINCT-word table with frequencies (the
  classic trick: the corpus is touched once to build word counts; every
  merge iteration then works on the vocabulary-sized word table, which
  is orders of magnitude smaller than the corpus);
- pair counting is one explode + one map-side-combinable weighted
  aggregate per iteration;
- the best pair is a TakeOrderedAndProject top-1 that re-enters the
  plan as a broadcast one-row scalar (no driver collect);
- merge application is the subtle part: BPE merges non-overlapping
  occurrences left-to-right ("aaaa" + merge(a,a) -> "(aa)(aa)", not
  three overlapping merges).  That greedy scan is NOT sequential: in a
  maximal run of consecutive merge-candidate positions, exactly the
  even offsets merge — a gaps-and-islands window partitioned PER WORD
  (bounded state, parallel across words), expressible identically in
  any SQL engine, which is what makes the whole training loop
  value-hash-checkable against an independent oracle;
- per-iteration state (word, freq, symbols) is localCheckpointed so
  the lineage stays flat across merges (same policy as pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import words


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    toks = df.select(F.explode(words(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    return toks.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_state(wf: DataFrame) -> DataFrame:
    # split into single characters: the initial symbol alphabet
    # (F.split's default limit=-1 keeps a trailing empty element — drop
    # empties so the alphabet is exactly the word's characters)
    return wf.select(
        "word",
        "freq",
        F.filter(F.split(F.col("word"), "(?!^)"), lambda x: x != "").alias("syms"),
    )


def _merge_round(state: DataFrame, step: int) -> tuple[DataFrame, DataFrame]:
    """One BPE iteration: returns (stats_row, next_state).

    stats_row is a ONE-row frame (step, left, right, pair_count,
    corpus_len_after, vocab_after); next_state is (word, freq, syms)
    with the best pair merged greedily left-to-right in every word.
    """
    pos = state.select("word", "freq", F.posexplode("syms").alias("pos", "s"))
    w = Window.partitionBy("word").orderBy("pos")
    pos = pos.withColumn("nxt", F.lead("s").over(w))

    pair_counts = (
        pos.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("s").alias("left"), F.col("nxt").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    best = (
        pair_counts.orderBy(
            F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
        )
        .limit(1)
    )

    # greedy non-overlapping merge: in each maximal run of consecutive
    # candidate positions, even offsets from the run start merge
    c = pos.crossJoin(F.broadcast(best))
    c = c.withColumn(
        "cand", (F.col("s") == F.col("left")) & (F.col("nxt") == F.col("right"))
    )
    rn = F.row_number().over(Window.partitionBy("word", "cand").orderBy("pos"))
    c = c.withColumn("isl", F.when(F.col("cand"), F.col("pos") - rn))
    run_start = F.min("pos").over(Window.partitionBy("word", "isl"))
    c = c.withColumn(
        "do_merge",
        F.col("cand") & (((F.col("pos") - run_start) % 2) == 0),
    )
    c = c.withColumn("absorbed", F.lag("do_merge").over(w))
    merged = (
        c.filter(~F.coalesce(F.col("absorbed"), F.lit(False)))
        .withColumn(
            "new_s",
            F.when(F.col("do_merge"), F.concat("s", "nxt")).otherwise(F.col("s")),
        )
    )
    next_state = (
        merged.groupBy("word", "freq")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "new_s"))),
                lambda x: x["new_s"],
            ).alias("syms")
        )
        .localCheckpoint(eager=False)
    )

    corpus = next_state.agg(
        (F.sum(F.col("freq") * F.size("syms"))).cast("long").alias("corpus_len_after")
    )
    vocab = (
        next_state.select(F.explode("syms").alias("s"))
        .agg(F.countDistinct("s").alias("vocab_after"))
    )
    stats = (
        best.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.lit(step).alias("step"),
            "left",
            "right",
            "pair_count",
            "corpus_len_after",
            "vocab_after",
        )
    )
    return stats, next_state


def bpe_train_state(
    df: DataFrame, text_col: str, n_merges: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules; returns (merges, state).

    ``merges`` is one row per step (step, left, right, pair_count,
    corpus_len_after, vocab_after); ``state`` is the trained tokenizer
    itself — every distinct word with its final symbol sequence
    (word, freq, syms), i.e. the lookup table ``bpe_encode`` applies.
    """
    state = _initial_state(_word_freqs(df, text_col)).localCheckpoint(eager=False)
    out: DataFrame | None = None
    for step in range(1, n_merges + 1):
        stats, state = _merge_round(state, step)
        out = stats if out is None else out.unionByName(stats)
    assert out is not None, "n_merges must be >= 1"
    return out, state


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 5) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules over the corpus.

    Returns one row per merge step: (step, left, right, pair_count,
    corpus_len_after, vocab_after) — the merge table itself plus the
    corpus compression trajectory, all exact integers/strings (no
    floats anywhere, so the whole training run value-hashes).

    Assumes the corpus has at least one adjacent pair at every step
    (i.e. n_merges is small relative to corpus symbol diversity).
    """
    return bpe_train_state(df, text_col, n_merges)[0]


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, state: DataFrame
) -> DataFrame:
    """Tokenize every document under a trained BPE ``state`` (from
    ``bpe_train_state``): per document, the whitespace words map to
    their merged symbol sequences via ONE join on the word — the
    classic word-level BPE serving path (the per-word encoding was
    computed once at train time; encoding a 100 TB corpus is a
    broadcast/shuffle join against the vocabulary-sized state table,
    never a re-run of the merge loop).

    Returns (id_col, n_words, n_chars, n_bpe_tokens, compression_r6)
    with compression = bpe_tokens / chars (det-rounded) — all counts
    exact integers.

    Out-of-vocabulary words (absent from the train-time state — the
    normal case when serving a DIFFERENT corpus) are NOT dropped: the
    join is a LEFT join and an OOV word falls back to character-level
    tokens (n_syms = word length), the no-merge-applies baseline.  The
    old inner join silently excluded OOV words from every count and
    dropped all-OOV documents entirely (round-5 review finding).  The
    fallback OVERCOUNTS tokens for an OOV word that contains learned
    pairs; exact OOV encoding would replay the merge table per distinct
    unseen word — acceptable for a tokenizer-stats operator, wrong to
    silently omit.
    """
    from ..functions.rounding import det_round

    toks = df.select(
        F.col(id_col), F.explode(words(text_col)).alias("word")
    ).filter(F.col("word") != "")
    enc = toks.join(
        F.broadcast(state.select("word", F.size("syms").alias("n_syms"))),
        "word",
        "left",
    ).withColumn("n_syms", F.coalesce("n_syms", F.length("word")))
    return enc.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
        F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        det_round(F.sum("n_syms") / F.sum(F.length("word"))).alias("compression_r6"),
    )
