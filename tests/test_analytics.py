"""Unit tests for registry/analytics.py: hand-computed small fixtures
for association rules, RFM quintiles, Gini, chi-square, conditional
entropy, and the seasonal-naive backtest — validating the math itself,
independent of the DuckDB oracle (which validates it again at sf0.01).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from movie_recommendation_engine_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return [r.asDict() for r in QUERIES[name](spark, sf).collect()]


def test_association_rules_math(spark):
    rows = _rows(spark, "basket_association_rules")
    assert rows, "min-support floor should keep at least some brand pairs"
    for r in rows:
        # confidence = n_ab / n_a, lift_ppm = floor(n_ab*N*1e6 / (n_a*n_b))
        assert r["n_ab"] <= r["n_a"] and r["n_ab"] <= r["n_b"]
        assert r["conf_r6"] == pytest.approx(r["n_ab"] / r["n_a"], abs=1e-6)
        assert r["lift_ppm"] == (
            r["n_ab"] * r["n_baskets"] * 1_000_000
        ) // (r["n_a"] * r["n_b"])
        # min support 0.5% of baskets
        assert r["n_ab"] * 200 >= r["n_baskets"]
    # both directions of a pair share n_ab (support is symmetric)
    sup = {(r["antecedent"], r["consequent"]): r["n_ab"] for r in rows}
    for (a, b), n in sup.items():
        if (b, a) in sup:
            assert sup[(b, a)] == n


def test_rfm_scores_are_quintiles(spark):
    rows = _rows(spark, "customer_rfm_segments")
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        scores = [r[col] for r in rows]
        assert set(scores) <= {1, 2, 3, 4, 5}
        # quintile buckets via floor((rnk-1)*5/n)+1 differ in size by <= 1
        from collections import Counter

        sizes = Counter(scores)
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"


def test_rfm_monetary_ordering(spark):
    """Customers sorted by m_cents must have non-decreasing m_score."""
    rows = sorted(
        _rows(spark, "customer_rfm_segments"), key=lambda r: (r["m_cents"], r["custkey"])
    )
    scores = [r["m_score"] for r in rows]
    assert scores == sorted(scores)


def test_gini_matches_bruteforce(spark):
    row = _rows(spark, "customer_revenue_gini")[0]
    # brute-force on the same base data
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cents = [
        r["cents"]
        for r in orders.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            )
        )
        .collect()
    ]
    xs = sorted(cents)
    n, s = len(xs), sum(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    top = sum(xs[n - n // 10 :])
    assert row["n_customers"] == n and row["total_cents"] == s
    assert row["gini_r6"] == pytest.approx(gini, abs=2e-6)
    assert row["top10_share_r6"] == pytest.approx(top / s, abs=2e-6)
    assert 0.0 <= row["gini_r6"] <= 1.0


def test_chi2_cells_reconcile(spark):
    rows = _rows(spark, "returnflag_priority_chi2")
    n = sum(r["observed"] for r in rows)
    for r in rows:
        assert r["expected_r6"] == pytest.approx(
            r["row_total"] * r["col_total"] / n, abs=1e-6
        )
        o, e = r["observed"], r["row_total"] * r["col_total"] / n
        assert r["contrib_r6"] == pytest.approx((o - e) ** 2 / e, abs=1e-5)
    # marginals are consistent across cells
    from collections import defaultdict

    rt = defaultdict(int)
    for r in rows:
        rt[r["flag"]] += r["observed"]
    for r in rows:
        assert rt[r["flag"]] == r["row_total"]


def test_conditional_entropy_bounds_and_math(spark):
    rows = _rows(spark, "brand_return_info_gain")
    for r in rows:
        assert r["cnt_r"] + r["cnt_a"] + r["cnt_n"] == r["n_rows"]
        h = 0.0
        for c in (r["cnt_r"], r["cnt_a"], r["cnt_n"]):
            if c:
                p = c / r["n_rows"]
                h -= p * math.log(p)
        assert r["h_cond_r6"] == pytest.approx(h, abs=1e-6)
        assert 0.0 <= r["h_cond_r6"] <= math.log(3) + 1e-9


def test_seasonal_forecast_is_lag12(spark):
    rows = _rows(spark, "monthly_seasonal_forecast")
    actual = {r["month"]: r["actual_cents"] for r in rows}
    # every forecast equals the actual of the same month one year back
    # (when that month is itself in the backtest output)
    for r in rows:
        y, m = map(int, r["month"].split("-"))
        prev = f"{y - 1:04d}-{m:02d}"
        if prev in actual:
            assert r["forecast_cents"] == actual[prev]
        assert r["ae_cents"] == abs(r["actual_cents"] - r["forecast_cents"])
        assert r["ape_r6"] == pytest.approx(
            r["ae_cents"] / r["actual_cents"], abs=1e-6
        )


def test_order_history_features_per_customer(spark):
    rows = _rows(spark, "customer_order_history_features")
    from collections import defaultdict

    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["custkey"]].append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r["seq"])
        n = len(rs)
        cents_seq = [r["cents"] for r in rs]
        for i, r in enumerate(rs):
            assert r["seq"] == i + 1 and r["n_orders"] == n
            assert r["first_cents"] == cents_seq[0]
            assert r["last_cents"] == cents_seq[-1]
            assert r["third_cents"] == (cents_seq[2] if n >= 3 else None)
            assert r["cume_r6"] == pytest.approx((i + 1) / n, abs=1e-6)
        assert rs[-1]["next_gap_days"] is None


def test_mad_outliers_bruteforce(spark):
    row = _rows(spark, "order_price_mad_outliers")[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cents = sorted(
        r["c"]
        for r in orders.select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    med2 = cents[(n + 1) // 2 - 1] + cents[(n + 2) // 2 - 1]
    dev2 = sorted(abs(2 * c - med2) for c in cents)
    mad4 = dev2[(n + 1) // 2 - 1] + dev2[(n + 2) // 2 - 1]
    n_out = sum(1 for d in dev2 if 40000 * d > 103782 * mad4)
    assert row["n_orders"] == n
    assert row["median_cents_x2"] == med2
    assert row["mad_cents_x4"] == mad4
    assert row["n_outliers"] == n_out
    assert row["top_robust_z_r6"] == pytest.approx(
        2 * dev2[-1] / (1.4826 * mad4), abs=1e-6
    )


def test_survival_curve_monotone_and_exact(spark):
    rows = _rows(spark, "customer_repeat_survival")
    assert rows[0]["surv_r6"] == pytest.approx(1.0, abs=1e-6) or rows[0]["gap_m"] > 0
    total = rows[0]["total"]
    # survival is non-increasing in gap and n_ge telescopes with n_gaps
    by_gap = sorted(rows, key=lambda r: r["gap_m"])
    for a, b in zip(by_gap, by_gap[1:]):
        assert a["n_ge"] >= b["n_ge"]
    assert sum(r["n_gaps"] for r in rows) == total
    # n_ge at the smallest gap covers every gap >= it
    assert by_gap[0]["n_ge"] == sum(
        r["n_gaps"] for r in rows if r["gap_m"] >= by_gap[0]["gap_m"]
    )


def test_negative_samples_properties(spark):
    rows = _rows(spark, "customer_negative_samples")
    # no sampled negative may be a seen positive
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    seen = {
        (r["c"], r["p"])
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .collect()
    }
    users = {c for c, _ in seen}
    part_keys = {
        r["p_partkey"] for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        assert (r["custkey"], r["neg_partkey"]) not in seen
        assert r["neg_partkey"] in part_keys
        assert 0 <= r["slot"] <= 7
        per_user[r["custkey"]].append(r["slot"])
    # every sampled user is a real user; at most 8 slots, no slot repeats
    for u, slots in per_user.items():
        assert u in users
        assert len(slots) == len(set(slots)) <= 8
    # draw is deterministic: a second invocation returns the same rows
    again = _rows(spark, "customer_negative_samples")
    assert rows == again


def test_decomposition_reconstructs_and_centers(spark):
    rows = _rows(spark, "monthly_revenue_decomposition")
    assert rows, "sf0.001 spans years, the centered window must produce rows"
    for r in rows:
        # additive identity holds to rounding noise
        recon = r["trend_r6"] + r["seasonal_r6"] + r["residual_r6"]
        assert recon == pytest.approx(r["actual_cents"], abs=5e-6 * max(1, r["actual_cents"]) + 1e-3)
    # seasonal component has (weighted) mean ~0 across observed months
    from collections import defaultdict

    by_moy = {}
    cnt = defaultdict(int)
    for r in rows:
        moy = int(r["month"].split("-")[1])
        by_moy[moy] = r["seasonal_r6"]
        cnt[moy] += 1
    wmean = sum(by_moy[m] * cnt[m] for m in by_moy) / sum(cnt.values())
    scale = max(abs(v) for v in by_moy.values()) or 1.0
    assert abs(wmean) <= 0.05 * scale + 1e-6


def test_abc_classification_boundaries(spark):
    rows = _rows(spark, "part_abc_classification")
    total = rows[-1]["cum_cents"]
    # revenue is non-increasing along rank; cum telescopes exactly
    cum = 0
    prev = None
    for r in sorted(rows, key=lambda r: r["rnk"]):
        if prev is not None:
            assert r["cents"] <= prev
        prev = r["cents"]
        cum += r["cents"]
        assert r["cum_cents"] == cum
        want = "A" if cum * 100 <= 80 * total else ("B" if cum * 100 <= 95 * total else "C")
        assert r["abc_class"] == want
    # classes appear in A, B, C order and all three exist
    classes = [r["abc_class"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert classes == sorted(classes)
    assert set(classes) == {"A", "B", "C"}


def test_ab_test_math(spark):
    r = _rows(spark, "ab_test_urgent_orders")[0]
    na, nb, xa, xb = r["n_a"], r["n_b"], r["x_a"], r["x_b"]
    assert xa <= na and xb <= nb and na > 0 and nb > 0
    pa, pb = xa / na, xb / nb
    pp = (xa + xb) / (na + nb)
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    assert r["p_a_r6"] == pytest.approx(pa, abs=1e-6)
    assert r["p_b_r6"] == pytest.approx(pb, abs=1e-6)
    assert r["z_r6"] == pytest.approx(z, abs=1e-6)
    assert r["significant_95"] == (abs(z) > 1.959963985)
    # a 50/50 content-hash split should be roughly balanced
    assert abs(na - nb) < 0.1 * (na + nb)


def test_revenue_shares_telescope(spark):
    rows = _rows(spark, "revenue_share_hierarchy")
    from collections import defaultdict

    nat = defaultdict(int)
    for r in rows:
        nat[r["nation"]] += r["cents"]
    # per-nation customer shares sum to ~1 and levels telescope
    by_nation = defaultdict(float)
    regions = {}
    for r in rows:
        by_nation[r["nation"]] += r["share_of_nation_r6"]
        regions.setdefault(r["region"], r["region_share_r6"])
        assert 0.0 <= r["share_of_nation_r6"] <= 1.0
        assert 0.0 <= r["nation_share_of_region_r6"] <= 1.0
    for n, s in by_nation.items():
        assert s == pytest.approx(1.0, abs=1e-3)
    assert sum(regions.values()) == pytest.approx(1.0, abs=1e-4)


def test_ks_statistic_bruteforce(spark):
    row = _rows(spark, "order_price_drift_ks")[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    import datetime

    cutoff = datetime.datetime(2000, 1, 1)
    ref = sorted(
        int(r["o_totalprice"] * 100 + 0.5) for r in orders if r["o_orderdate"] < cutoff
    )
    cur = sorted(
        int(r["o_totalprice"] * 100 + 0.5) for r in orders if r["o_orderdate"] >= cutoff
    )
    n1, n2 = len(ref), len(cur)
    import bisect

    vals = sorted(set(ref) | set(cur))
    d_num = max(
        abs(bisect.bisect_right(ref, v) * n2 - bisect.bisect_right(cur, v) * n1)
        for v in vals
    )
    assert (row["n_ref"], row["n_cur"]) == (n1, n2)
    assert row["d_num"] == d_num
    assert row["d_r6"] == pytest.approx(d_num / (n1 * n2), abs=1e-6)
    import math

    assert row["reject_95"] == (
        d_num / (n1 * n2) > 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    )
