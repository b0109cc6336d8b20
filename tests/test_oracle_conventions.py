"""Static convention audit over every registered oracle's SQL.

Two latent hash-flake classes were found (and fixed) in rounds 3-4 by
scale sweeps; these greps keep them extinct without running a query:

- ``round(avg(<double expr>))`` — a float SUM folds in partial-
  aggregation order, so the 6th decimal can flip with partitioning
  (doc_rrf_fusion's embedded unigram replica, embedding_norm_stats).
  The convention is integer micro-units: quantize per-row/per-model-row
  with floor(x*1e6), sum exact BIGINTs, det-round the final division.
  avg over EXACT values (integers, 0.0/1.0 indicators) is safe — every
  partial sum is an exactly-representable double — so the audit targets
  avg whose argument contains an irrational producer (sqrt/ln/log) or
  an inexact division.
- engine ``rand()``/``random()`` — partition/run-dependent; all
  sampling derives from md5 content hashes.
"""

from __future__ import annotations

import re

from movie_recommendation_engine_spark.registry import ORACLES

_IRRATIONAL = re.compile(r"sqrt|ln\s*\(|log\s*\(|/", re.I)
# exact-valued avg arguments that are explicitly safe (indicator means)
_SAFE_AVG = re.compile(r"THEN\s+1\.0\s+ELSE\s+0\.0", re.I)


def _agg_args(sql: str, fname: str) -> list[str]:
    """Every argument of ``fname(...)`` in ``sql``, extracted with a
    paren-balance scan — a fixed-nesting regex silently skips deeper
    arguments like ``avg(ln(a / (b + c)))``, i.e. false-negatives on
    exactly the complex expressions most likely to drift (round-4
    ADVICE finding)."""
    out = []
    for m in re.finditer(rf"\b{fname}\s*\(", sql, re.I):
        depth, start = 1, m.end()
        for i in range(start, len(sql)):
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    out.append(sql[start:i])
                    break
        else:  # unbalanced SQL is itself a bug worth failing on
            raise AssertionError(f"unbalanced parens after {fname}( in: {sql[m.start():m.start()+120]!r}")
    return out


def test_no_engine_rand_in_oracles():
    for name, sql in ORACLES.items():
        assert not re.search(r"\brandom\s*\(|\brand\s*\(", sql, re.I), (
            f"{name} oracle uses engine RNG; derive from md5 content hashes"
        )


def test_no_float_avg_over_irrational_expressions():
    offenders = []
    for name, sql in ORACLES.items():
        for arg in _agg_args(sql, "avg"):
            if _SAFE_AVG.search(arg):
                continue
            if _IRRATIONAL.search(arg):
                offenders.append((name, arg.strip()[:80]))
    assert not offenders, (
        "float AVG over an order-sensitive double expression (quantize to "
        f"integer micro-units instead): {offenders}"
    )


# Accepted float-sum exceptions, each with its boundedness argument.
# popularity_eval_pipeline sums 1/log2(rank+1) DCG terms and j/pos AP
# terms PER USER over ranking lists bounded at k=100: the float error of
# a <=100-term sum is ~1e-15 relative, two orders below the round-6
# boundary, and the query has been hash-green across all six sweep
# configurations since round 1.  Anything new must use micro-units.
_SUM_ACCEPTED = {"popularity_eval_pipeline"}


def test_no_float_sum_over_irrational_expressions():
    irr = re.compile(r"sqrt|ln\s*\(|log2?\s*\(|exp\s*\(|(?<!/)/(?!/)", re.I)
    offenders = []
    for name, sql in ORACLES.items():
        if name in _SUM_ACCEPTED:
            continue
        for arg in _agg_args(sql, "sum"):
            # integer division (//) and pure-integer CASE arms are exact
            if "//" in arg:
                continue
            # a sum whose WHOLE argument is cast to DECIMAL accumulates
            # exactly (order-independent); the per-row double inside is
            # computed on identical operands in both engines — this is
            # the documented convention, not a violation
            # (ann_lsh_recall's per-query recall terms, surfaced by the
            # balanced extractor that replaced the fixed-depth regex)
            if re.match(
                r"\s*CAST\s*\(.*AS\s+DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)\s*\)\s*$",
                arg,
                re.I | re.S,
            ):
                continue
            if irr.search(arg):
                offenders.append((name, arg.strip()[:80]))
    assert not offenders, (
        "float SUM over an order-sensitive double expression (quantize to "
        f"integer micro-units instead): {offenders}"
    )


def test_no_engine_round_of_avg():
    for name, sql in ORACLES.items():
        assert not re.search(r"round\s*\(\s*avg\s*\(", sql, re.I), (
            f"{name} oracle rounds a float AVG; use the micro-unit + "
            "det_round convention"
        )
