"""Fifth batch: the per-user ranking metrics (the engine's evaluation
backbone — AP@k, precision/recall@k, hit, NDCG@k, MRR@k, and the
reference's nonstandard mAP) against textbook formulas on arbitrary
rec lists and truth sets — partial hits, no hits, recs shorter than k,
truth larger than k, hits beyond the k cutoff (which must count for
ref-mAP but not the @k metrics)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

ITEMS = list(range(1, 13))

case_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(ITEMS), min_size=1, max_size=8, unique=True),
        st.lists(st.sampled_from(ITEMS), min_size=1, max_size=6, unique=True),
    ),
    min_size=1,
    max_size=6,
)


def _ref_metrics(recs: list[int], truth: list[int], k: int):
    topk = recs[:k]
    tset = set(truth)
    hits_prefix, ap = 0, 0.0
    for i, item in enumerate(topk, start=1):
        if item in tset:
            hits_prefix += 1
            ap += hits_prefix / i
    ap /= min(k, len(truth))
    n_hits = len(set(topk) & tset)
    dcg = sum(
        1.0 / math.log2(i + 1)
        for i, item in enumerate(topk, start=1)
        if item in tset
    )
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, min(k, len(truth)) + 1))
    first = next((i for i, it in enumerate(topk, start=1) if it in tset), None)
    ref_ap = (
        sum(
            (1.0 + 1.0 / (recs.index(m) + 1)) / len(recs)
            for m in truth
            if m in recs
        )
        / len(truth)
    )
    return {
        "ap": ap,
        "precision": n_hits / k,
        "recall": n_hits / len(truth),
        "hit": 1.0 if n_hits else 0.0,
        "ndcg": dcg / idcg,
        "rr": 1.0 / first if first else 0.0,
        "ref_ap": ref_ap,
    }


@settings(max_examples=8, deadline=None)
@given(cases=case_strategy, k=st.sampled_from([1, 3, 5]))
def test_ranking_metrics_match_textbook_formulas(spark_global, cases, k):
    from movie_recommendation_engine_spark.plans.metrics import (
        per_user_ranking_metrics,
    )

    spark = spark_global
    recs = spark.createDataFrame(
        [(u, r) for u, (r, _) in enumerate(cases)],
        "userId int, recs array<int>",
    )
    truth = spark.createDataFrame(
        [(u, t) for u, (_, t) in enumerate(cases)],
        "userId int, truth array<int>",
    )
    got = {
        r.userId: r.asDict()
        for r in per_user_ranking_metrics(
            recs, truth, k=k, round_to=None
        ).collect()
    }
    assert set(got) == set(range(len(cases)))
    for u, (r, t) in enumerate(cases):
        want = _ref_metrics(r, t, k)
        for name, w in want.items():
            g = got[u][name]
            assert abs(g - w) < 1e-9, (u, name, g, w, r, t)
