"""Third-implementation checks: 60 queries re-derived from raw parquet.

The registry's correctness gate compares Spark against a DuckDB oracle,
but for the lattice-recursion families BOTH sides deliberately implement
the SAME algorithm (shared risk-set CTEs, identical quantized recursions)
— a conceptual bug in the recursion or in the risk-set/censoring
semantics would pass the gate on both engines. Each test here recomputes
the query from the RAW parquet with an independent pure-Python/pandas
implementation (textbook formulas, arbitrary-precision ints where the
query is integer-exact) and compares against the Spark output at sf0.001.

Integer-exact queries (Kaplan-Meier, Nelson-Aalen, DTW, LPA, IPF,
BPE, SimHash, ...) must match EXACTLY; float recursions (Holt-Winters,
PageRank) within the per-step-rounding drift bound; one-shot float
statistics within round-6 tolerance. Combined with the property/fuzz/
recall test families elsewhere in tests/, every one of the 21 bench
contract queries carries independent evidence beyond the oracle.
The module passes at BOTH sf0.001 and sf0.01 (run it at the larger
scale with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 — its first
sf0.01 run caught a pandas int64 overflow in a test reference).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def _survival_inputs(sf_dir):
    """(cohort, t, d, c, n_risk) rows exactly as _SURV_RISK_CTES defines
    them: lifetimes in days, horizon censoring, first-event cohorts
    (tie-broken by event_id), reverse-cumulative risk sets."""
    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].dt.normalize()
    u = ev.groupby("user_id")["day"].agg(first_day="min", last_day="max")
    horizon = u["last_day"].max()
    fe = (
        ev.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .first()["event_type"]
        .rename("cohort")
    )
    pu = u.join(fe)
    pu["dur"] = (pu["last_day"] - pu["first_day"]).dt.days
    pu["observed"] = (pu["last_day"] < horizon).astype(int)
    g = (
        pu.groupby(["cohort", "dur"])["observed"]
        .agg(d="sum", total="count")
        .reset_index()
    )
    g["c"] = g["total"] - g["d"]
    g = g.sort_values(["cohort", "dur"])
    # reverse-cumulative risk set per cohort
    g["n_risk"] = (
        (g["d"] + g["c"])[::-1].groupby(g["cohort"][::-1]).cumsum()[::-1]
    )
    return g


def test_kaplan_meier_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    g = _survival_inputs(sf_dir)
    expected = {}
    for cohort, grp in g[g["d"] > 0].groupby("cohort"):
        su = 1_000_000
        for _, row in grp.sort_values("dur").iterrows():
            n, d = int(row["n_risk"]), int(row["d"])
            su = (2 * su * (n - d) + n) // (2 * n)
            expected[(cohort, int(row["dur"]))] = (
                d, int(row["c"]), n, su / 1_000_000.0
            )

    out = queries()["window_kaplan_meier"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        d, c, n, surv = expected[(r["cohort"], r["duration_days"])]
        assert (r["deaths"], r["censored"], r["n_risk"]) == (d, c, n)
        # both sides divide the SAME integer lattice value by 1e6
        assert r["survival"] == surv


def test_nelson_aalen_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    g = _survival_inputs(sf_dir)
    expected = {}
    for cohort, grp in g[g["d"] > 0].groupby("cohort"):
        cum = 0
        for _, row in grp.sort_values("dur").iterrows():
            n, d = int(row["n_risk"]), int(row["d"])
            h_u = (2 * 1_000_000 * d + n) // (2 * n)
            cum += h_u
            expected[(cohort, int(row["dur"]))] = (
                d, n, h_u / 1e6, cum / 1e6
            )

    out = queries()["window_nelson_aalen"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        d, n, step, cum = expected[(r["cohort"], r["duration_days"])]
        assert (r["deaths"], r["n_risk"]) == (d, n)
        assert r["hazard_step"] == step
        assert r["cum_hazard"] == cum


def test_dtw_vs_textbook_dp(spark, sf_dir):
    """The query removes the row-inner sequential dependence with a
    min-plus prefix identity; the textbook O(n·m) three-way recursion is
    the independent check — integer-exact, so equality is exact."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    day = ev["ts"].dt.normalize()
    # Sunday anchor: pandas weekday() is Mon=0..Sun=6
    week = day - pd.to_timedelta((day.dt.weekday + 1) % 7, unit="D")
    ev["week"] = week

    def weekly(etype):
        s = (
            ev[ev["event_type"] == etype]
            .groupby("week")
            .size()
            .sort_index()
        )
        return [int(v) for v in s]

    xs, ys = weekly("click"), weekly("purchase")
    n, m = len(xs), len(ys)
    assert n > 0 and m > 0
    INF = float("inf")
    prev = [0.0] + [INF] * m
    for xi in xs:
        cur = [INF] * (m + 1)
        for j in range(1, m + 1):
            cost = abs(xi - ys[j - 1])
            cur[j] = cost + min(prev[j], prev[j - 1], cur[j - 1])
        prev = cur
    expected = int(prev[m])

    row = queries()["ts_dtw"](spark, sf_dir).collect()[0]
    assert (row["n"], row["m"]) == (n, m)
    assert row["dtw_distance"] == expected
    assert row["dtw_per_step"] == pytest.approx(
        expected / (n + m), abs=1e-6
    )


def test_anova_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    cents = od.assign(
        c=(od["o_totalprice"] * 100.0 + 0.5).map(math.floor),
        stratum=od["o_orderpriority"],
    )
    st = cents.groupby("stratum")["c"].agg(["count", "sum"])
    # Σx² per stratum in a plain dict of Python ints: a pandas
    # groupby-apply SILENTLY coerces the ~7.5e19 per-stratum squares
    # back to int64 at sf0.01 and wraps negative (caught when this test
    # first ran at that scale)
    q_by: dict = {}
    for stratum, v in zip(cents["stratum"], cents["c"]):
        q_by[stratum] = q_by.get(stratum, 0) + int(v) * int(v)
    k = len(st)
    n = int(st["count"].sum())
    s_tot = int(st["sum"].sum())
    q_tot = sum(q_by.values())
    fold = 0.0
    for stratum in sorted(st.index):  # the stratum-sorted left fold
        sg, ng = int(st.loc[stratum, "sum"]), int(st.loc[stratum, "count"])
        fold += float(sg * sg) / float(ng)
    ssb = fold - float(s_tot * s_tot) / float(n)
    ssw = float(q_tot) - fold
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))

    row = queries()["agg_anova_oneway"](spark, sf_dir).collect()[0]
    assert (row["k"], row["n"]) == (k, n)
    assert row["ssb"] == pytest.approx(ssb, rel=1e-12)
    assert row["ssw"] == pytest.approx(ssw, rel=1e-12)
    assert row["f_stat"] == pytest.approx(f_stat, abs=1e-6)


def test_chi2_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    ct = (
        od.groupby(["o_orderpriority", "o_orderstatus"])
        .size()
        .rename("obs")
        .reset_index()
    )
    r = ct.groupby("o_orderpriority")["obs"].sum()
    c = ct.groupby("o_orderstatus")["obs"].sum()
    n = int(ct["obs"].sum())
    cells = {}
    chi2 = 0.0
    for _, row in ct.sort_values(
        ["o_orderpriority", "o_orderstatus"]
    ).iterrows():
        ri = int(r[row["o_orderpriority"]])
        ci = int(c[row["o_orderstatus"]])
        obs = int(row["obs"])
        num = n * obs - ri * ci  # exact python int
        expected = float(ri * ci) / float(n)
        term = float(num * num) / float(n * ri * ci)
        chi2 += term
        cells[(row["o_orderpriority"], row["o_orderstatus"])] = (
            obs, expected, term
        )
    dof = (len(r) - 1) * (len(c) - 1)

    out = queries()["agg_chi2_independence"](spark, sf_dir).collect()
    assert len(out) == len(cells) > 0
    for sp in out:
        obs, expected, term = cells[(sp["priority"], sp["status"])]
        assert sp["obs"] == obs
        assert sp["expected"] == pytest.approx(expected, abs=1e-6)
        assert sp["term"] == pytest.approx(term, abs=1e-6)
        assert sp["chi2"] == pytest.approx(chi2, abs=1e-6)
        assert sp["dof"] == dof


def _round6_half_up(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def test_holt_winters_vs_pure_python(spark, sf_dir):
    """Per-step-rounded additive Holt-Winters (m=7, α=0.4 β=0.3 γ=0.2)
    replayed as a plain Python loop. Both sides round every state
    variable to the 6dp lattice per step; the Python half-up rounding
    can differ from Spark's BigDecimal at exact midpoints (the query
    chooses non-power-of-two coefficients precisely so values stay
    ~1e-12 off midpoints), so assert within 1e-5 instead of exactly —
    still far below any semantic-error signal (wrong coefficient, ring
    rotation, or seed shows up at 1e-2+)."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].dt.normalize()
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    expected = {}
    for key, grp in daily.groupby("event_type"):
        series = list(
            grp.sort_values("day")[["day", "y"]].itertuples(index=False)
        )
        if len(series) <= 7:
            continue
        head = [float(y) for _, y in series[:7]]
        l = _round6_half_up(sum(head) / 7.0)
        b = 0.0
        sv = [_round6_half_up(y - l) for y in head]
        for day, y in series[7:]:
            y = float(y)
            lt = _round6_half_up(0.4 * (y - sv[0]) + 0.6 * (l + b))
            bt = _round6_half_up(0.3 * (lt - l) + 0.7 * b)
            st = _round6_half_up(0.2 * (y - lt) + 0.8 * sv[0])
            fc = _round6_half_up(lt + bt + sv[1])
            sv = sv[1:] + [st]
            l, b = lt, bt
            expected[(key, day)] = (int(y), lt, bt, st, fc)

    out = queries()["ts_holt_winters"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        y, lt, bt, st, fc = expected[
            (r["event_type"], pd.Timestamp(r["day"]))
        ]
        assert r["y"] == y
        assert r["level"] == pytest.approx(lt, abs=1e-5)
        assert r["trend"] == pytest.approx(bt, abs=1e-5)
        assert r["seasonal"] == pytest.approx(st, abs=1e-5)
        assert r["forecast_next"] == pytest.approx(fc, abs=1e-5)


def _daily_clicks(sf_dir):
    ev = _events(sf_dir)
    ev = ev[ev["event_type"] == "click"]
    s = ev.groupby(ev["ts"].dt.normalize()).size().sort_index()
    return [int(v) for v in s]


def test_acf_vs_pure_python(spark, sf_dir):
    """Integer-exact ACF: c = n·y − Σy makes numerator and denominator
    pure BIGINTs, so the pandas recomputation must agree to the final
    rounded division."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].dt.normalize()
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    expected = {}
    for key, grp in daily.groupby("event_type"):
        ys = [int(v) for v in grp.sort_values("day")["y"]]
        n, s = len(ys), sum(ys)
        c = [n * y - s for y in ys]
        denom = sum(v * v for v in c)
        for lag in range(1, 8):
            pairs = [(c[t], c[t - lag]) for t in range(lag, n)]
            if not pairs:
                continue
            numer = sum(a * b for a, b in pairs)
            acf = (
                round(float(numer) / float(denom), 6) if denom > 0 else None
            )
            expected[(key, lag)] = (len(pairs), n, acf)

    out = queries()["ts_acf"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        pairs, n_days, acf = expected[(r["event_type"], r["lag"])]
        assert (r["pairs"], r["n_days"]) == (pairs, n_days)
        if acf is None:
            assert r["acf"] is None
        else:
            assert r["acf"] == pytest.approx(acf, abs=2e-6)


def test_matrix_profile_vs_pure_python(spark, sf_dir):
    """All-pairs z-normalized NN distances (m=4, exclusion |i−j|<m) from
    exact integer window moments — argmin indices must match exactly."""
    from gisaid_pipeline_functions_spark.registry import queries

    a = _daily_clicks(sf_dir)
    m = 4
    n = len(a)
    n_sub = n - m + 1
    expected = {}
    for i in range(1, n_sub + 1):
        best = None
        wi = a[i - 1 : i - 1 + m]
        sx, sxx = sum(wi), sum(v * v for v in wi)
        if m * sxx - sx * sx <= 0:
            continue
        for j in range(1, n_sub + 1):
            if abs(i - j) < m:
                continue
            wj = a[j - 1 : j - 1 + m]
            sy, syy = sum(wj), sum(v * v for v in wj)
            if m * syy - sy * sy <= 0:
                continue
            sxy = sum(p * q for p, q in zip(wi, wj))
            r_ = float(m * sxy - sx * sy) / math.sqrt(
                float(m * sxx - sx * sx) * float(m * syy - sy * sy)
            )
            dd = math.sqrt(2 * m * max(1.0 - r_, 0.0))
            if best is None or (dd, j) < best:
                best = (dd, j)
        if best is not None:
            expected[i] = best

    out = queries()["ts_matrix_profile"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        dd, j = expected[r["sub_idx"]]
        assert r["nn_idx"] == j
        assert r["nn_dist"] == pytest.approx(dd, abs=2e-6)


def test_optimal_changepoints_vs_pure_python(spark, sf_dir):
    """Jackson et al. optimal partitioning replayed as the textbook
    forward DP + backtrack loop (exact integer prefix sums, identical
    float cost trees, first-occurrence argmin)."""
    from gisaid_pipeline_functions_spark.registry import queries

    a = _daily_clicks(sf_dir)
    n = len(a)
    sp = [0]
    qp = [0]
    for y in a:
        sp.append(sp[-1] + y)
        qp.append(qp[-1] + y * y)
    beta = (float(qp[n]) - float(sp[n] * sp[n]) / float(n)) / 8.0

    fs = [-beta]
    cps = [0]
    for t in range(1, n + 1):
        cand = []
        for s in range(0, t):
            ln = t - s
            sd = sp[t] - sp[s]
            cost = float(qp[t] - qp[s]) - float(sd * sd) / float(ln)
            cand.append(fs[s] + cost + beta)
        best = min(cand)
        fs.append(best)
        cps.append(cand.index(best))

    segs = {}
    e = n
    while e > 0:
        s = cps[e]
        seg_sum = sp[e] - sp[s]
        segs[(s + 1, e)] = (
            e - s, seg_sum, round(float(seg_sum) / float(e - s), 6)
        )
        e = s

    out = queries()["ts_optimal_changepoints"](spark, sf_dir).collect()
    assert len(out) == len(segs) > 0
    for r in out:
        nd, ssum, smean = segs[(r["start_idx"], r["end_idx"])]
        assert (r["n_days"], r["seg_sum"]) == (nd, ssum)
        assert r["seg_mean"] == pytest.approx(smean, abs=1e-6)


def test_hill_tail_index_vs_pure_python(spark, sf_dir):
    """Top-k selection + lattice-quantized log-ratios recomputed from a
    plain Python sort. The per-row ln quantization makes the k-term sum
    an exact integer; libm vs JVM log can differ by 1 ulp, so allow the
    integer sum to drift by ±2 units (2e-6 in inv_alpha) — far below
    any selection or threshold bug."""
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    k = 100
    rows = sorted(
        (
            (int(round(p * 100)), int(okey))
            for p, okey in zip(od["o_totalprice"], od["o_orderkey"])
        ),
        key=lambda t: (-t[0], t[1]),
    )
    top = [c for c, _ in rows[: k + 1]]
    x_k1 = top[k]
    sum_lr = sum(
        int(math.floor(math.log(c / x_k1) * 1e6 + 0.5)) for c in top[:k]
    )

    r = queries()["agg_hill_tail_index"](spark, sf_dir).collect()[0]
    assert r["k"] == k
    assert abs(r["sum_lr_u"] - sum_lr) <= 2
    assert r["inv_alpha"] == pytest.approx(sum_lr / k / 1e6, abs=3e-6)
    assert r["alpha"] == pytest.approx(k * 1e6 / sum_lr, rel=1e-4)


def test_benford_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    cents = (
        (li[li["l_extendedprice"] > 0]["l_extendedprice"] * 100.0 + 0.5)
        .map(math.floor)
        .astype(int)
    )
    digits = cents.map(lambda c: int(str(c)[0]))
    counts = digits.value_counts().to_dict()
    n = int(len(cents))

    out = queries()["agg_benford_digit_test"](spark, sf_dir).collect()
    assert len(out) == 9
    for r in out:
        d = r["digit"]
        obs = counts.get(d, 0)
        p = math.log10(1.0 + 1.0 / d)
        assert r["observed"] == obs
        assert r["n"] == n
        assert r["expected"] == pytest.approx(n * p, abs=1e-6)
        dev = float(obs) - n * p
        assert r["chi2_term"] == pytest.approx(dev * dev / (n * p), abs=1e-6)


def test_granger_lite_vs_numpy_lstsq(spark, sf_dir):
    """The query solves both OLS models closed-form by Cramer's rule on
    DECIMAL(38,0) normal equations; numpy.linalg.lstsq is an entirely
    different solver (SVD), so agreement here checks the algebra, the
    lag alignment, and the F construction."""
    import numpy as np

    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    day = ev["ts"].dt.normalize()
    ev["week"] = day - pd.to_timedelta((day.dt.weekday + 1) % 7, unit="D")
    wk = (
        ev.pivot_table(
            index="week", columns="event_type", values="event_id",
            aggfunc="count", fill_value=0,
        )
        .rename(columns={"click": "cl", "purchase": "pu"})
        .sort_index()
    )
    pairs = []
    idx = {w: i for i, w in enumerate(wk.index)}
    for w in wk.index:
        nxt = w + pd.Timedelta(days=7)
        if nxt in idx:
            pairs.append(
                (
                    int(wk.loc[nxt, "cl"]),  # y_t
                    int(wk.loc[w, "cl"]),    # a = y_{t-1}
                    int(wk.loc[w, "pu"]),    # b = x_{t-1}
                )
            )
    y = np.array([p[0] for p in pairs], dtype=float)
    a = np.array([p[1] for p in pairs], dtype=float)
    b = np.array([p[2] for p in pairs], dtype=float)
    n = len(pairs)

    def rss(X):
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        return float(resid @ resid)

    ones = np.ones(n)
    rss_r = rss(np.column_stack([ones, a]))
    rss_f = rss(np.column_stack([ones, a, b]))
    f_stat = (rss_r - rss_f) / (rss_f / (n - 3))

    r = queries()["ts_granger_lite"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    # outputs are round(., 6): allow the 5e-7 rounding step on top of
    # the solver-difference band
    assert r["rss_r"] == pytest.approx(rss_r, rel=1e-9, abs=6e-7)
    assert r["rss_f"] == pytest.approx(rss_f, rel=1e-9, abs=6e-7)
    assert r["f_stat"] == pytest.approx(f_stat, rel=1e-6, abs=6e-7)


def _copurchase_edges_py(sf_dir):
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    li = li[li["l_quantity"] >= 35]
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp["l_partkey"]))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    return edges


def test_pagerank_vs_pure_python(spark, sf_dir):
    """Five power-method rounds replayed as a dict loop. Both engines
    round the damped update to the 6dp lattice per round; the
    contribution sum's addition order is engine-internal, so allow one
    lattice unit — a wrong damping factor, out-degree, or lost vertex
    moves ranks by far more."""
    from gisaid_pipeline_functions_spark.registry import queries

    edges = _copurchase_edges_py(sf_dir)
    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    n = len(nbrs)
    assert n > 0
    d = 0.85
    r = {v: _round6_half_up(1.0 / n) for v in nbrs}
    for _ in range(5):
        s = {v: 0.0 for v in nbrs}
        for v, ns in nbrs.items():
            contrib = r[v] / len(ns)
            for w in ns:
                s[w] += contrib
        r = {
            v: _round6_half_up((1.0 - d) / n + d * s[v]) for v in nbrs
        }

    out = queries()["graph_pagerank"](spark, sf_dir).collect()
    assert len(out) == n
    for row in out:
        assert row["pagerank"] == pytest.approx(
            r[row["vertex"]], abs=1.1e-6
        )


def test_label_propagation_vs_pure_python(spark, sf_dir):
    """Four synchronous LPA rounds as a dict loop — integer-only
    (vote count desc, label asc tie-break), so equality is exact."""
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    edges = _copurchase_edges_py(sf_dir)
    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {v: v for v in nbrs}
    for _ in range(4):
        labels = {
            v: min(
                Counter(labels[w] for w in ns).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v, ns in nbrs.items()
        }

    out = queries()["graph_label_propagation"](spark, sf_dir).collect()
    assert len(out) == len(labels) > 0
    for row in out:
        assert row["community"] == labels[row["vertex"]]


def test_mann_whitney_vs_pandas_midranks(spark, sf_dir):
    """The query derives 2·midrank as min+max of the exact global rank;
    pandas rank(method='average') is the textbook midrank formulation —
    U statistics must agree exactly (doubled to stay on integers)."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)
    ev = ev[ev["event_type"].isin(["click", "purchase"])].copy()
    ev["v"] = ev["value"].round(6)
    ranks2 = (2 * ev["v"].rank(method="average")).astype(int)
    g1 = ev["event_type"] == "click"
    n1, n2 = int(g1.sum()), int((~g1).sum())
    r1_x2 = int(ranks2[g1].sum())
    r2_x2 = int(ranks2[~g1].sum())
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    u2_x2 = r2_x2 - n2 * (n2 + 1)
    assert u1_x2 + u2_x2 == 2 * n1 * n2  # invariant

    r = queries()["agg_mann_whitney"](spark, sf_dir).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert (r["u1_x2"], r["u2_x2"]) == (u1_x2, u2_x2)


def test_ks_test_vs_float_ecdf(spark, sf_dir):
    """The query maximizes the scaled-integer |c1·n2 − c2·n1|; the
    float two-ECDF sup-distance is the textbook formulation."""
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    cents = (od["o_totalprice"] * 100.0 + 0.5).map(math.floor).astype(int)
    g1 = od["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    n1, n2 = int(g1.sum()), int((~g1).sum())
    vs = sorted(set(cents))
    c1 = c2 = 0
    cnt1 = cents[g1].value_counts()
    cnt2 = cents[~g1].value_counts()
    best_num, best_v, best_d = -1, None, -1.0
    for v in vs:
        c1 += int(cnt1.get(v, 0))
        c2 += int(cnt2.get(v, 0))
        num = abs(c1 * n2 - c2 * n1)
        if num > best_num:
            best_num, best_v = num, v
        best_d = max(best_d, abs(c1 / n1 - c2 / n2))

    r = queries()["agg_ks_test"](spark, sf_dir).collect()[0]
    assert (r["n1"], r["n2"], r["d_num"]) == (n1, n2, best_num)
    assert r["ks_d"] == pytest.approx(best_d, abs=1e-6)
    assert r["ks_lambda"] == pytest.approx(
        best_d * math.sqrt(n1 * n2 / (n1 + n2)), abs=1e-6
    )
    assert r["price_at_max"] == pytest.approx(best_v / 100.0, abs=1e-9)


def test_spearman_vs_pandas_corr(spark, sf_dir):
    """pandas .corr(method='spearman') is a fully independent midrank +
    Pearson-on-ranks implementation vs the query's closed-form doubled
    midranks and DECIMAL(38,0) moments."""
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    import numpy as np

    x = li["l_quantity"].astype(int)
    y = (li["l_extendedprice"] * 100.0 + 0.5).map(math.floor).astype(int)
    # pandas spearman delegates to scipy (absent): float midranks +
    # numpy Pearson instead — independent of the query's doubled-
    # integer closed form either way
    rx = x.rank(method="average").to_numpy()
    ry = y.rank(method="average").to_numpy()
    rho = float(np.corrcoef(rx, ry)[0, 1])

    r = queries()["agg_spearman_rho"](spark, sf_dir).collect()[0]
    assert r["n"] == len(li)
    assert r["spearman_rho"] == pytest.approx(rho, abs=2e-6)


def test_ipf_raking_vs_pure_python(spark, sf_dir):
    """Three IPF rounds replayed with arbitrary-precision Python ints —
    the same half-up lattice divisions, so equality is exact."""
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    ct = (
        od.groupby(["o_orderpriority", "o_orderstatus"])
        .size()
        .rename("n")
        .reset_index()
    )
    cells = {
        (r["o_orderpriority"], r["o_orderstatus"]): int(r["n"])
        for _, r in ct.iterrows()
    }
    t = sum(cells.values())
    t_row = (t * 1_000_000) // 5
    t_col = (t * 1_000_000) // 3
    w = {k: 1_000_000 for k in cells}
    for _ in range(3):
        srow = {}
        for (p, s), n in cells.items():
            srow[p] = srow.get(p, 0) + w[(p, s)] * n
        w = {
            (p, s): (2 * w[(p, s)] * t_row + srow[p]) // (2 * srow[p])
            for (p, s) in cells
        }
        scol = {}
        for (p, s), n in cells.items():
            scol[s] = scol.get(s, 0) + w[(p, s)] * n
        w = {
            (p, s): (2 * w[(p, s)] * t_col + scol[s]) // (2 * scol[s])
            for (p, s) in cells
        }

    out = queries()["agg_ipf_raking"](spark, sf_dir).collect()
    assert len(out) == len(cells) > 0
    for r in out:
        key = (r["priority"], r["status"])
        assert r["n"] == cells[key]
        assert r["weight"] == w[key] / 1e6
        assert r["fitted"] == (w[key] * cells[key]) / 1e6


def test_diff_in_diff_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir).copy()
    od["g"] = (od["o_orderpriority"] == "1-URGENT").astype(int)
    od["p"] = (od["o_orderdate"].dt.year >= 1998).astype(int)
    od["cents"] = (od["o_totalprice"] * 100).round().astype(int)
    means = {}
    for (g, p), grp in od.groupby(["g", "p"]):
        means[(g, p)] = float(int(grp["cents"].sum())) / float(
            len(grp) * 100
        )
    did = (means[(1, 1)] - means[(1, 0)]) - (
        means[(0, 1)] - means[(0, 0)]
    )

    r = queries()["agg_diff_in_diff"](spark, sf_dir).collect()[0]
    assert r["n_total"] == len(od)
    assert r["mean_treated_post"] == pytest.approx(means[(1, 1)], abs=1e-6)
    assert r["mean_treated_pre"] == pytest.approx(means[(1, 0)], abs=1e-6)
    assert r["mean_control_post"] == pytest.approx(means[(0, 1)], abs=1e-6)
    assert r["mean_control_pre"] == pytest.approx(means[(0, 0)], abs=1e-6)
    assert r["did"] == pytest.approx(did, abs=2e-6)


def test_linreg_normal_eq_vs_numpy_lstsq(spark, sf_dir):
    """Per-language OLS slope/intercept via numpy lstsq vs the query's
    exact-BIGINT normal equations (intercept derives from the ALREADY-
    rounded slope, so recompute it the same way after matching the
    unrounded slope)."""
    import numpy as np

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang", "n_chars"]
    )
    docs["x"] = docs["text"].map(
        lambda t: sum(1 for w in t.split(" ") if w)
    )
    expected = {}
    for lang, grp in docs.groupby("lang"):
        x = grp["x"].to_numpy(dtype=float)
        y = grp["n_chars"].to_numpy(dtype=float)
        n = len(grp)
        if np.all(x == x[0]):
            expected[lang] = (n, None, None)
            continue
        beta, *_ = np.linalg.lstsq(
            np.column_stack([np.ones(n), x]), y, rcond=None
        )
        slope = _round6_half_up(float(beta[1]))
        intercept = (float(y.sum()) - slope * float(x.sum())) / n
        expected[lang] = (n, slope, intercept)

    out = queries()["train_linreg_normal_eq"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        n, slope, intercept = expected[r["grp"]]
        assert r["n_rows"] == n
        if slope is None:
            assert r["slope"] is None
        else:
            assert r["slope"] == pytest.approx(slope, abs=1.1e-6)
            assert r["intercept"] == pytest.approx(intercept, abs=2e-6)


def test_cuped_vs_numpy(spark, sf_dir):
    import numpy as np

    from gisaid_pipeline_functions_spark.registry import queries

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    od = _orders(sf_dir).copy()
    od["cents"] = (od["o_totalprice"] * 100).round().astype(int)
    od["yr"] = od["o_orderdate"].dt.year
    pre = od[od["yr"] <= 1997].groupby("o_custkey")["cents"].sum()
    post = od[od["yr"] >= 1998].groupby("o_custkey")["cents"].sum()
    x = cust["c_custkey"].map(pre).fillna(0).to_numpy(dtype=float)
    y = cust["c_custkey"].map(post).fillna(0).to_numpy(dtype=float)
    n = len(cust)
    var_x = float(np.var(x))          # population (1/n) moments, as the
    var_y = float(np.var(y))          # query's n·syy − sy² over n² form
    cov = float(np.cov(x, y, bias=True)[0, 1])
    theta = cov / var_x
    var_cuped = var_y - cov * cov / var_x
    reduction = (cov * cov / var_x) / var_y

    r = queries()["agg_cuped"](spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["theta"] == pytest.approx(theta, abs=1.1e-6)
    assert r["var_y"] == pytest.approx(var_y, rel=1e-9)
    assert r["var_cuped"] == pytest.approx(var_cuped, rel=1e-9)
    assert r["variance_reduction"] == pytest.approx(reduction, abs=1.1e-6)


def test_mann_kendall_vs_pure_python(spark, sf_dir):
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    ys = _daily_clicks(sf_dir)
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = [t for t in Counter(ys).values() if t > 1]
    tp = sum(t * (t - 1) // 2 for t in ties)
    tv = sum(t * (t - 1) * (2 * t + 5) for t in ties)
    half = n * (n - 1) // 2
    tau_b = s / math.sqrt(float(half) * float(half - tp))
    zc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    z = zc / math.sqrt((n * (n - 1) * (2 * n + 5) - tv) / 18.0)

    r = queries()["ts_mann_kendall"](spark, sf_dir).collect()[0]
    assert (r["n"], r["s_stat"]) == (n, s)
    assert r["tau_b"] == pytest.approx(tau_b, abs=1e-6)
    assert r["z_stat"] == pytest.approx(z, abs=1e-6)


def test_bruteforce_topk_vs_numpy(spark, sf_dir):
    """The flagship exact-ANN baseline vs a numpy cosine matrix — ranks
    are on round-6 cosine + id tie-break, so the independent float sum
    order can't flip them."""
    import numpy as np

    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=float)
        for _, r in emb.iterrows()
    }
    expected = {}
    for qid in sorted(vecs):
        if qid >= 5:
            continue
        q = vecs[qid]
        qn = math.sqrt(float(q @ q))
        scored = []
        for cid, c in vecs.items():
            if cid == qid:
                continue
            cos = float(q @ c) / (qn * math.sqrt(float(c @ c)))
            scored.append((_round6_half_up(cos), cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        expected[qid] = scored[:3]

    out = queries()["sim_bruteforce_topk"](spark, sf_dir).collect()
    assert len(out) == 3 * len(expected) > 0
    for r in out:
        cos, cid = expected[r["query_id"]][r["rank"] - 1]
        assert r["cand_id"] == cid
        assert r["cos"] == pytest.approx(cos, abs=2e-6)


def test_theil_sen_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].dt.normalize()
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    expected = {}
    for key, grp in daily.groupby("event_type"):
        pts = sorted(
            (row["day"], int(row["y"])) for _, row in grp.iterrows()
        )
        pairs = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dd = (pts[j][0] - pts[i][0]).days
                slope = _round6_half_up((pts[j][1] - pts[i][1]) / dd)
                pairs.append((slope, pts[i][0], pts[j][0]))
        pairs.sort()
        n = len(pairs)
        expected[key] = (n, pairs[math.ceil(n / 2.0) - 1][0])

    out = queries()["ts_theil_sen_trend"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        n, slope = expected[r["key"]]
        assert r["n_pairs"] == n
        assert r["theil_sen_slope"] == pytest.approx(slope, abs=1.1e-6)


def test_cohort_retention_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    day = ev["ts"].dt.normalize()
    ev["week"] = day - pd.to_timedelta((day.dt.weekday + 1) % 7, unit="D")
    act = ev[["user_id", "week"]].drop_duplicates()
    cohort = act.groupby("user_id")["week"].min().rename("cohort_week")
    j = act.join(cohort, on="user_id")
    j["week_offset"] = ((j["week"] - j["cohort_week"]).dt.days // 7)
    expected = (
        j.groupby(["cohort_week", "week_offset"])["user_id"]
        .nunique()
        .to_dict()
    )

    out = queries()["window_cohort_retention"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        key = (pd.Timestamp(r["cohort_week"]), r["week_offset"])
        assert r["n_users"] == expected[key]


def test_activity_streaks_vs_pure_python(spark, sf_dir):
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)
    ud = (
        ev.assign(d=ev["ts"].dt.normalize())[["user_id", "d"]]
        .drop_duplicates()
    )
    hist: Counter = Counter()
    for _, grp in ud.groupby("user_id"):
        days = sorted(grp["d"])
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            best = max(best, cur)
        hist[best] += 1

    out = queries()["window_activity_streaks"](spark, sf_dir).collect()
    assert len(out) == len(hist) > 0
    for r in out:
        assert r["n_users"] == hist[r["max_streak"]]


def _daily_by_type(sf_dir):
    ev = _events(sf_dir)
    d = (
        ev.groupby(["event_type", ev["ts"].dt.normalize()])
        .size()
        .rename("y")
        .reset_index()
        .rename(columns={"ts": "day"})
    )
    return {
        key: [(row["day"], int(row["y"]))
              for _, row in grp.sort_values("day").iterrows()]
        for key, grp in d.groupby("event_type")
    }


def test_ccf_pairs_vs_pure_python(spark, sf_dir):
    """Exact-integer centered cross-correlation over the common daily
    index, lags −3..3 — Python-int moments, so only the final rounded
    division is float."""
    from gisaid_pipeline_functions_spark.registry import queries

    series = _daily_by_type(sf_dir)
    keys = sorted(series)
    expected = {}
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            da_, db_ = dict(series[ka]), dict(series[kb])
            days = sorted(set(da_) & set(db_))
            n = len(days)
            if n == 0:
                continue
            ya = [da_[d] for d in days]
            yb = [db_[d] for d in days]
            sa, sb = sum(ya), sum(yb)
            ca = [n * v - sa for v in ya]
            cb = [n * v - sb for v in yb]
            dena = sum(v * v for v in ca)
            denb = sum(v * v for v in cb)
            for lag in range(-3, 4):
                # b.rn = a.rn - lag (1-based rn → 0-based index)
                pairs = [
                    (ca[t], cb[t - lag])
                    for t in range(n)
                    if 0 <= t - lag < n
                ]
                if not pairs:
                    continue
                numer = sum(x * y for x, y in pairs)
                ccf = (
                    round(float(numer) / math.sqrt(float(dena) * float(denb)), 6)
                    if dena > 0 and denb > 0
                    else None
                )
                expected[(ka, kb, lag)] = (len(pairs), n, ccf)

    out = queries()["ts_ccf_pairs"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        pairs, n_days, ccf = expected[(r["key_a"], r["key_b"], r["lag"])]
        assert (r["pairs"], r["n_days"]) == (pairs, n_days)
        if ccf is None:
            assert r["ccf"] is None
        else:
            assert r["ccf"] == pytest.approx(ccf, abs=2e-6)


def test_periodogram_vs_true_trig(spark, sf_dir):
    """The query uses a shared 1e-6-quantized trig table so neither
    engine evaluates cos(); this reference uses TRUE libm cos/sin and
    bounds the quantization error analytically — |Δ(Σc·cos)| ≤
    5.1e-7·Σ|c| per component. A wrong centering, phase indexing, or
    normalization lands far outside the bound."""
    from gisaid_pipeline_functions_spark.registry import queries

    series = _daily_by_type(sf_dir)
    expected = {}
    for key, pts in series.items():
        ys = [y for _, y in pts]
        n = len(ys)
        s = sum(ys)
        c = [n * y - s for y in ys]
        abs_sum = sum(abs(v) for v in c)
        for p in range(3, 11):
            a = sum(
                v * math.cos(2.0 * math.pi * ((t % p)) / p)
                for t, v in enumerate(c)
            ) / n
            b = sum(
                v * math.sin(2.0 * math.pi * ((t % p)) / p)
                for t, v in enumerate(c)
            ) / n
            power = (a * a + b * b) / n
            comp_err = 5.1e-7 * abs_sum / n
            bound = (
                2 * (abs(a) + abs(b)) * comp_err + 2 * comp_err * comp_err
            ) / n + 1e-6
            expected[(key, p)] = (n, power, bound)

    out = queries()["ts_periodogram"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        n, power, bound = expected[(r["event_type"], r["period"])]
        assert r["n_days"] == n
        assert r["power"] == pytest.approx(power, abs=bound)
    # dominance: argmax must agree when the true margin exceeds the
    # summed quantization bound
    for key in series:
        ps = {p: expected[(key, p)] for p in range(3, 11)}
        best = max(ps.items(), key=lambda kv: kv[1][1])
        runner = max(
            (kv for kv in ps.items() if kv[0] != best[0]),
            key=lambda kv: kv[1][1],
        )
        margin = best[1][1] - runner[1][1]
        if margin > best[1][2] + runner[1][2]:
            dom = [
                r["period"]
                for r in out
                if r["event_type"] == key and r["is_dominant"]
            ]
            assert dom == [best[0]]


def test_welch_ttest_vs_pure_python(spark, sf_dir):
    """Lattice sums replayed with Python ints, then the textbook Welch
    t / Welch-Satterthwaite df in plain float."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)

    def lat(x):
        return int(math.floor(x * 1e6 + 0.5))

    stats = {}
    for key in ("click", "purchase"):
        vals = ev[ev["event_type"] == key]["value"]
        n = len(vals)
        s = sum(lat(float(v)) for v in vals)
        q = sum(lat(float(v) * float(v)) for v in vals)
        mean = (s / 1e6) / n
        var = ((q / 1e6) - n * mean * mean) / (n - 1)
        stats[key] = (n, mean, var)

    na, ma, va = stats["click"]
    nb, mb, vb = stats["purchase"]
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = (se2 * se2) / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )

    r = queries()["agg_ab_ttest"](spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["mean_a"] == pytest.approx(ma, abs=1e-6)
    assert r["mean_b"] == pytest.approx(mb, abs=1e-6)
    assert r["var_a"] == pytest.approx(va, abs=1e-6)
    assert r["var_b"] == pytest.approx(vb, abs=1e-6)
    assert r["t_stat"] == pytest.approx(t, abs=1e-6)
    assert r["welch_df"] == pytest.approx(df, rel=1e-6)
    assert r["significant_05"] == (abs(t) > 1.96)


def test_eb_shrinkage_vs_pure_python(spark, sf_dir):
    """Beta-binomial method-of-moments shrinkage recomputed from pandas
    joins and a nation-sorted float loop."""
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j = od.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["u"] = (j["o_orderpriority"] == "1-URGENT").astype(int)
    g = j.groupby("n_name")["u"].agg(n="count", pos="sum")
    rates = {nm: int(row["pos"]) / int(row["n"]) for nm, row in g.iterrows()}
    k = len(rates)
    mu = sum(rates[nm] for nm in sorted(rates)) / k
    vv = sum((rates[nm] - mu) ** 2 for nm in sorted(rates)) / k
    alpha = mu * (mu * (1 - mu) / vv - 1)
    beta = (1 - mu) * (mu * (1 - mu) / vv - 1)

    out = queries()["agg_eb_shrinkage"](spark, sf_dir).collect()
    assert len(out) == k > 0
    for r in out:
        n, pos = int(g.loc[r["nation"], "n"]), int(g.loc[r["nation"], "pos"])
        assert (r["n"], r["pos"]) == (n, pos)
        assert r["raw_rate"] == pytest.approx(pos / n, abs=1e-6)
        assert r["shrunk_rate"] == pytest.approx(
            (pos + alpha) / (n + alpha + beta), abs=1.1e-6
        )


def test_stl_decompose_vs_pure_python(spark, sf_dir):
    """Classical additive STL replayed as plain loops: row-windowed
    7-point centered trend, epoch-arithmetic day-of-week, offset-shifted
    half-up lattice seasonal means."""
    from gisaid_pipeline_functions_spark.registry import queries

    series = _daily_by_type(sf_dir)
    epoch = pd.Timestamp("1970-01-01")
    expected = {}
    for key, pts in series.items():
        n = len(pts)
        rows = []
        for i, (day, y) in enumerate(pts):
            if 3 <= i < n - 3:
                window = [pts[j][1] for j in range(i - 3, i + 4)]
                trend = _round6_half_up(sum(window) / 7.0)
            else:
                trend = None
            dow = (pts[i][0] - epoch).days % 7
            rows.append((day, y, trend, dow))
        sums = {}
        for day, y, trend, dow in rows:
            if trend is None:
                continue
            detr_u = int(math.floor((y - trend) * 1e6 + 0.5))
            s, c = sums.get(dow, (0, 0))
            sums[dow] = (s + detr_u + 1_000_000_000, c + 1)
        seas = {
            dow: ((2 * s + c) // (2 * c) - 1_000_000_000) / 1e6
            for dow, (s, c) in sums.items()
        }
        for day, y, trend, dow in rows:
            if dow in seas:
                detr = (
                    _round6_half_up(y - trend) if trend is not None else None
                )
                resid = (
                    _round6_half_up(detr - seas[dow])
                    if detr is not None
                    else None
                )
                expected[(key, day)] = (y, trend, seas[dow], resid)

    out = queries()["ts_stl_decompose"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        y, trend, seasonal, resid = expected[
            (r["key"], pd.Timestamp(r["day"]))
        ]
        assert r["y"] == y
        if trend is None:
            assert r["trend"] is None and r["residual"] is None
        else:
            assert r["trend"] == pytest.approx(trend, abs=1.1e-6)
            assert r["residual"] == pytest.approx(resid, abs=2.2e-6)
        assert r["seasonal"] == pytest.approx(seasonal, abs=1.1e-6)


def test_bpe_train_vs_sennrich_loop(spark, sf_dir):
    """The 6 learned merges vs the classic Sennrich dict loop: corpus-
    frequency-weighted adjacent pair counts over the distinct-word
    table, (cnt desc, a asc, b asc) tie-break, greedy leftmost-first
    non-overlapping merge application — exact equality of the model."""
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freq: Counter = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                freq[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in freq}

    def apply_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    expected = []
    for rank in range(1, 7):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            f = freq[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rank, a, b, a + b, cnt))
        vocab = {w: apply_merge(s, a, b) for w, s in vocab.items()}

    out = sorted(
        queries()["text_bpe_train"](spark, sf_dir).collect(),
        key=lambda r: r["merge_rank"],
    )
    got = [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["merged"], r["cnt"])
        for r in out
    ]
    assert got == expected


def test_unigram_lm_em_vs_pure_python(spark, sf_dir):
    """SentencePiece-style unigram EM replayed as plain dict loops:
    substring seed vocab (len ≤ 4, min_count 2 or single char),
    integer-lattice Viterbi with the su·128 + (127 − s) argmax key,
    Laplace M-step over the fixed seed vocab, two rounds. EM counts are
    exact; ll allows ±2 lattice units for libm-vs-JVM ln."""
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    wf: Counter = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if w:
                wf[w] += 1

    L, MIN_COUNT, ROUNDS = 4, 2, 2
    seed: Counter = Counter()
    for w, f in wf.items():
        n = len(w)
        for s in range(n):
            for e in range(s + 1, min(s + L, n) + 1):
                seed[w[s:e]] += f
    vocab = {
        p: c for p, c in seed.items() if c >= MIN_COUNT or len(p) == 1
    }
    v = len(vocab)
    total = sum(vocab.values())
    llu = {
        p: int(math.floor(math.log((c + 1) / (total + v)) * 1e6 + 0.5))
        for p, c in vocab.items()
    }

    counts: Counter = Counter()
    for _ in range(ROUNDS):
        counts = Counter()
        for w, f in wf.items():
            n = len(w)
            best = [(0, [])]
            for j in range(1, n + 1):
                cand = [
                    (best[s][0] + llu[w[s:j]], s)
                    for s in range(max(0, j - L), j)
                    if w[s:j] in llu
                ]
                su, s = max(cand, key=lambda t: t[0] * 128 + 127 - t[1])
                best.append((su, best[s][1] + [(s, j)]))
            for s, e in best[n][1]:
                counts[w[s:e]] += f
        total = sum(counts.get(p, 0) for p in vocab)
        llu = {
            p: int(
                math.floor(
                    math.log((counts.get(p, 0) + 1) / (total + v)) * 1e6
                    + 0.5
                )
            )
            for p in vocab
        }

    out = queries()["train_unigram_lm_em"](spark, sf_dir).collect()
    assert len(out) == v > 0
    for r in out:
        assert r["n_count"] == counts.get(r["piece"], 0)
        assert r["ll"] == pytest.approx(llu[r["piece"]] / 1e6, abs=2.1e-6)


def test_association_rules_vs_pure_python(spark, sf_dir):
    """A-priori rules replayed with dicts: distinct baskets, min-support
    pruning before pair generation, both rule directions, top-100 by
    (rounded lift desc, antecedent, consequent)."""
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    li = li[li["l_quantity"] >= 25][["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = li["l_orderkey"].nunique()
    ic = {
        int(p): int(c)
        for p, c in li.groupby("l_partkey").size().items()
        if c >= 2
    }
    pc: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(int(p) for p in grp["l_partkey"] if int(p) in ic)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pc[(parts[i], parts[j])] += 1
    rows = []
    for (u, v), cuv in pc.items():
        if cuv < 2:
            continue
        for a, c in ((u, v), (v, u)):
            sup = _round6_half_up(cuv / n_baskets)
            conf = _round6_half_up(cuv / ic[a])
            lift = _round6_half_up((cuv / ic[a]) / (ic[c] / n_baskets))
            rows.append((a, c, cuv, sup, conf, lift))
    rows.sort(key=lambda t: (-t[5], t[0], t[1]))
    expected = rows[:100]

    out = queries()["agg_association_rules"](spark, sf_dir).collect()
    got = [
        (
            r["antecedent"], r["consequent"], r["n_both"],
            r["support"], r["confidence"], r["lift"],
        )
        for r in out
    ]
    assert len(got) == len(expected) > 0
    for g, e in zip(got, expected):
        assert g[:3] == e[:3]
        for gv, ev in zip(g[3:], e[3:]):
            assert gv == pytest.approx(ev, abs=1.1e-6)


def test_mad_anomaly_vs_pandas(spark, sf_dir):
    """Robust MAD outliers via pandas linear-interpolated medians —
    flagged event-id sets must match exactly."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)
    flagged = {}
    for key, grp in ev.groupby("event_type"):
        med = _round6_half_up(float(grp["value"].quantile(0.5)))
        adev = (grp["value"] - med).abs().map(_round6_half_up)
        mad = _round6_half_up(float(adev.quantile(0.5)))
        hits = grp.loc[adev > 3 * mad, "event_id"]
        for eid in hits:
            flagged[int(eid)] = key

    out = queries()["window_mad_anomaly"](spark, sf_dir).collect()
    assert {r["event_id"] for r in out} == set(flagged)
    for r in out:
        assert flagged[r["event_id"]] == r["event_type"]


def test_gini_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)
    rev = od.groupby("o_custkey")["o_totalprice"].sum().round(2)
    ranked = sorted(
        ((float(v), int(ck)) for ck, v in rev.items())
    )
    n = len(ranked)
    total = 0
    rank_weighted = 0
    for rank, (v, _ck) in enumerate(ranked, start=1):
        xc = int(math.floor(v * 100 + 0.5))
        total += xc
        rank_weighted += rank * xc
    gini = (2.0 * rank_weighted - (n + 1) * total) / (n * total)

    r = queries()["agg_gini_concentration"](spark, sf_dir).collect()[0]
    assert (r["n_customers"], r["total_cents"]) == (n, total)
    assert r["gini"] == pytest.approx(gini, abs=1.1e-6)


def test_abc_analysis_vs_pure_python(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    cents_per_part: dict = {}
    for pk, p, d in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_discount"]
    ):
        c = int(math.floor(float(p) * (1 - float(d)) * 100 + 0.5))
        cents_per_part[int(pk)] = cents_per_part.get(int(pk), 0) + c
    ranked = sorted(cents_per_part.items(), key=lambda t: (-t[1], t[0]))
    total = sum(cents_per_part.values())
    classes: dict = {}
    cum = 0
    for pk, c in ranked:
        cum += c
        cls = "A" if cum * 100 <= total * 70 else (
            "B" if cum * 100 <= total * 90 else "C"
        )
        n_parts, rev = classes.get(cls, (0, 0))
        classes[cls] = (n_parts + 1, rev + c)

    out = queries()["agg_abc_analysis"](spark, sf_dir).collect()
    assert len(out) == len(classes) > 0
    for r in out:
        n_parts, rev = classes[r["abc_class"]]
        assert (r["n_parts"], r["revenue_cents"]) == (n_parts, rev)
        assert r["revenue_share"] == pytest.approx(rev / total, abs=1.1e-6)


def test_funnel_ordered_conversion_vs_pandas(spark, sf_dir):
    """The chained min-aggregation funnel replayed per user with plain
    timestamp comparisons — stage assignments must match exactly."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)
    one_day = pd.Timedelta(days=1)
    expected = {}
    for uid, grp in ev.groupby("user_id"):
        views = grp.loc[grp["event_type"] == "view", "ts"]
        t1 = views.min() if len(views) else None
        t2 = t3 = None
        if t1 is not None:
            clicks = grp.loc[
                (grp["event_type"] == "click")
                & (grp["ts"] > t1)
                & (grp["ts"] <= t1 + one_day),
                "ts",
            ]
            t2 = clicks.min() if len(clicks) else None
        if t2 is not None:
            buys = grp.loc[
                (grp["event_type"] == "purchase")
                & (grp["ts"] > t2)
                & (grp["ts"] <= t2 + one_day),
                "ts",
            ]
            t3 = buys.min() if len(buys) else None
        expected[int(uid)] = (
            3 if t3 is not None else 2 if t2 is not None
            else 1 if t1 is not None else 0
        )

    out = queries()["funnel_ordered_conversion"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        assert r["stage_reached"] == expected[r["user_id"]]


def test_join_asof_vs_pandas_merge_asof(spark, sf_dir):
    """The contract as-of join (tagged-union carry-forward, ONE shuffle)
    vs pandas.merge_asof — a completely independent backward-search
    implementation. Right side deduped to one row per (customer, date)
    with max orderkey, matching the query's tie rule."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)[["event_id", "user_id", "ts"]]
    od = (
        _orders(sf_dir)
        .groupby(["o_custkey", "o_orderdate"])["o_orderkey"]
        .max()
        .reset_index()
    )
    left = ev.sort_values("ts").reset_index(drop=True)
    right = od.sort_values("o_orderdate").reset_index(drop=True)
    m = pd.merge_asof(
        left,
        right,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        direction="backward",
        allow_exact_matches=True,
    )
    m = m[m["o_orderkey"].notna()]
    expected = {
        int(r["event_id"]): (int(r["o_orderkey"]), r["o_orderdate"])
        for _, r in m.iterrows()
    }

    out = queries()["join_asof"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        okey, odate = expected[r["event_id"]]
        assert r["last_orderkey"] == okey
        assert pd.Timestamp(r["last_orderdate"]).normalize() == pd.Timestamp(
            odate
        ).normalize()


def test_interval_overlap_vs_pure_python(spark, sf_dir):
    """Strict interval intersections via plain per-day dict loops —
    exact integer micros."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["day"] = ev["ts"].dt.normalize()
    a = ev.groupby(["user_id", "day"])["ts"].agg(sa="min", ea="max")
    b = ev.groupby(["event_type", "day"])["ts"].agg(sb="min", eb="max")
    b_by_day: dict = {}
    for (etype, day), row in b.iterrows():
        b_by_day.setdefault(day, []).append(
            (etype, row["sb"], row["eb"])
        )
    expected = {}
    for (uid, day), row in a.iterrows():
        for etype, sb, eb in b_by_day.get(day, []):
            lo = max(row["sa"], sb)
            hi = min(row["ea"], eb)
            if lo < hi:
                expected[(int(uid), etype, day)] = (
                    hi.value - lo.value
                ) // 1000  # pandas ns → micros

    out = queries()["join_interval_overlap"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        key = (r["user_id"], r["event_type"], pd.Timestamp(r["day"]))
        assert r["overlap_micros"] == expected[key]


def test_flagship_weekly_prevalence_vs_pandas(spark, sf_dir):
    """The flagship weekly prevalence top-n recomputed with pandas
    Sunday bucketing, share-of-week division, and the (total desc, key)
    top-10 — counts exact, percentages to the rounded lattice."""
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    day = ev["ts"].dt.normalize()
    ev["week"] = day - pd.to_timedelta((day.dt.weekday + 1) % 7, unit="D")
    freq = (
        ev.groupby(["week", "event_type"]).size().rename("freq").reset_index()
    )
    wtot = freq.groupby("week")["freq"].sum().rename("wtot")
    totals = (
        freq.groupby("event_type")["freq"].sum().sort_values(
            ascending=False
        )
    )
    top = sorted(
        totals.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    topkeys = {k: int(v) for k, v in top}
    expected = {}
    for _, r in freq.iterrows():
        k = r["event_type"]
        if k not in topkeys:
            continue
        w = r["week"]
        expected[(k, w)] = (
            int(r["freq"]),
            int(r["freq"]) / int(wtot[w]),
            topkeys[k],
        )

    out = queries()["flagship_weekly_prevalence_topn"](
        spark, sf_dir
    ).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        f, pct, tot = expected[
            (r["event_type"], pd.Timestamp(r["week_start"]))
        ]
        assert (r["freq"], r["total_freq"]) == (f, tot)
        assert r["pct"] == pytest.approx(pct, abs=1.1e-6)


def _sunday_week(series):
    day = series.dt.normalize()
    return day - pd.to_timedelta((day.dt.weekday + 1) % 7, unit="D")


def test_join_large_equi_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)[["o_orderkey", "o_orderpriority"]]
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    j = od.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    j["rev"] = j["l_extendedprice"] * (1 - j["l_discount"])
    g = j.groupby("o_orderpriority")["rev"].agg(revenue="sum", n="count")

    out = queries()["join_large_equi"](spark, sf_dir).collect()
    assert len(out) == len(g) > 0
    for r in out:
        row = g.loc[r["o_orderpriority"]]
        assert r["n"] == int(row["n"])
        # round(.,2) of a float sum whose order differs → one cent slack
        assert r["revenue"] == pytest.approx(float(row["revenue"]), abs=0.011)


def test_agg_group_sum_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )
    g = li.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"),
        sum_price=("l_extendedprice", "sum"),
        avg_disc=("l_discount", "mean"),
        n=("l_quantity", "count"),
    )

    out = queries()["agg_group_sum"](spark, sf_dir).collect()
    assert len(out) == len(g) > 0
    for r in out:
        row = g.loc[(r["l_returnflag"], r["l_linestatus"])]
        assert r["n"] == int(row["n"])
        assert r["sum_qty"] == pytest.approx(float(row["sum_qty"]), abs=1e-6)
        assert r["sum_price"] == pytest.approx(
            float(row["sum_price"]), abs=0.011
        )
        assert r["avg_disc"] == pytest.approx(
            float(row["avg_disc"]), abs=1.1e-6
        )


def test_agg_collect_list_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
    )
    expected = {}
    for ok, grp in li.groupby("l_orderkey"):
        items = sorted(
            (int(p), int(ln))
            for p, ln in zip(grp["l_partkey"], grp["l_linenumber"])
        )
        expected[int(ok)] = (
            ",".join(str(p) for p, _ in items), len(items)
        )

    out = queries()["agg_collect_list"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        parts, n = expected[r["l_orderkey"]]
        assert (r["parts"], r["n_items"]) == (parts, n)


def test_topk_by_revenue_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .groupby(li["l_partkey"])
        .sum()
        .round(2)
    )
    ranked = sorted(
        ((float(v), int(pk)) for pk, v in rev.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]

    out = queries()["topk_by_revenue"](spark, sf_dir).collect()
    assert len(out) == 10
    for r, (v, pk) in zip(out, ranked):
        assert r["l_partkey"] == pk
        assert r["revenue"] == pytest.approx(v, abs=0.011)


def test_weekly_freq_matrix_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["week"] = _sunday_week(ev["ts"])
    freq = ev.groupby(["week", "event_type"]).size()
    totals = ev.groupby("week").size()
    expected = {
        (w, k): int(v) for (w, k), v in freq.items()
    } | {(w, "Total_Genomes"): int(v) for w, v in totals.items()}

    out = queries()["ts_weekly_freq_matrix"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        assert (
            expected[(pd.Timestamp(r["week_start"]), r["key"])] == r["freq"]
        )


def test_weekly_combinations_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["week"] = _sunday_week(ev["ts"])
    combos = (
        ev.groupby(["week", "user_id"])["event_type"]
        .agg(lambda s: ",".join(sorted(set(s))))
        .rename("combo")
        .reset_index()
    )
    expected = {
        (w, c): int(v)
        for (w, c), v in combos.groupby(["week", "combo"]).size().items()
    }

    out = queries()["ts_weekly_combinations"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        assert (
            expected[(pd.Timestamp(r["week_start"]), r["combo"])]
            == r["freq"]
        )


def test_region_rollup_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir)[["o_custkey", "o_orderdate"]]
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nat = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pd.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    j = (
        od.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["week"] = _sunday_week(j["o_orderdate"])
    per = j.groupby(["r_name", "week"]).size()
    tot = j.groupby("week").size()
    expected = {(rn, w): int(v) for (rn, w), v in per.items()} | {
        ("Worldwide", w): int(v) for w, v in tot.items()
    }

    out = queries()["ts_region_rollup"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        assert (
            expected[(r["region"], pd.Timestamp(r["week_start"]))] == r["n"]
        )


def test_reshape_pivot_wide_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir).copy()
    ev["week"] = _sunday_week(ev["ts"]).dt.strftime("%Y-%m-%d")
    freq = ev.groupby(["event_type", "week"]).size()
    weeks = sorted(set(w for _, w in freq.index))

    out = queries()["reshape_pivot_wide"](spark, sf_dir).collect()
    cols = queries()["reshape_pivot_wide"](spark, sf_dir).columns
    assert sorted(c for c in cols if c != "key") == weeks
    keys = set()
    for r in out:
        keys.add(r["key"])
        for w in weeks:
            want = freq.get((r["key"], w))
            if want is None:
                assert r[w] is None
            else:
                assert r[w] == int(want)
    assert keys == set(ev["event_type"].unique())


def test_simhash_vs_hashlib(spark, sf_dir):
    """16-bit SimHash recomputed with hashlib.md5 and a plain vote loop
    — bit-exact fingerprints."""
    import hashlib

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    expected = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        votes = [0] * 16
        for w in text.split(" "):
            if not w:
                continue
            h = hashlib.md5(w.encode("utf-8")).hexdigest()
            for i in range(16):
                votes[i] += 1 if h[i] in "89abcdef" else -1
        expected[int(did)] = sum(
            2**i for i in range(16) if votes[i] > 0
        )

    out = queries()["dedup_simhash"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        assert r["simhash"] == expected[r["id"]]


def test_unimax_vs_pure_python(spark, sf_dir):
    """UniMax water-filling replayed as a plain sorted loop with exact
    integer division — allocations exact."""
    import re

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    avail: dict = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        n = sum(1 for t in re.split(r"\s+", text) if t)
        avail[lang] = avail.get(lang, 0) + n
    order = sorted(avail.items(), key=lambda kv: (kv[1], kv[0]))
    rem = sum(avail.values()) * 2 // 3
    k = len(order)
    expected = {}
    for i, (lang, av) in enumerate(order, start=1):
        alloc = min(av, rem // (k - i + 1))
        rem -= alloc
        expected[lang] = (av, alloc, round(alloc / av, 6))

    out = queries()["sample_unimax"](spark, sf_dir).collect()
    assert len(out) == k > 0
    for r in out:
        av, alloc, epochs = expected[r["lang"]]
        assert (r["avail_tokens"], r["alloc_tokens"]) == (av, alloc)
        assert r["epochs_used"] == pytest.approx(epochs, abs=1e-6)


def test_sample_temperature_vs_hashlib(spark, sf_dir):
    """The deterministic md5-prefix Bernoulli with sqrt-damped source
    thresholds replayed via hashlib — selected doc sets exact."""
    import hashlib

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    c = docs.groupby("source").size()
    w = {s: int(math.floor(math.sqrt(n))) for s, n in c.items()}
    sw = sum(w.values())
    kq = int(math.floor(int(c.sum()) / 2.0))
    th = {
        s: format(
            min(
                int(math.floor(kq * w[s] * 4294967296.0 / (sw * int(c[s])))),
                4294967295,
            ),
            "08x",
        )
        for s in c.index
    }
    expected = set()
    for did, src in zip(docs["doc_id"], docs["source"]):
        h = hashlib.md5(str(int(did)).encode()).hexdigest()[:8]
        if h < th[src]:
            expected.add(int(did))

    out = queries()["sample_temperature"](spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == expected
    assert len(expected) > 0


def test_time_to_convert_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    ev = _events(sf_dir)
    fc = (
        ev[ev["event_type"] == "click"].groupby("user_id")["ts"].min()
    )
    buckets: dict = {}
    for uid, t1 in fc.items():
        buys = ev[
            (ev["user_id"] == uid)
            & (ev["event_type"] == "purchase")
            & (ev["ts"] >= t1)
        ]["ts"]
        if not len(buys):
            continue
        gap_us = (buys.min().value - t1.value) // 1000
        gh = gap_us // 3600000000
        b = (
            "<1h" if gh == 0 else "1-24h" if gh < 24
            else "1-7d" if gh < 168 else "7d+"
        )
        n, lo, hi = buckets.get(b, (0, None, None))
        buckets[b] = (
            n + 1,
            gh if lo is None else min(lo, gh),
            gh if hi is None else max(hi, gh),
        )

    out = queries()["window_time_to_convert"](spark, sf_dir).collect()
    assert len(out) == len(buckets) > 0
    for r in out:
        n, lo, hi = buckets[r["latency_bucket"]]
        assert (r["n_users"], r["min_hours"], r["max_hours"]) == (n, lo, hi)


def test_ltv_triangle_vs_pandas(spark, sf_dir):
    from gisaid_pipeline_functions_spark.registry import queries

    od = _orders(sf_dir).copy()
    od["yr"] = od["o_orderdate"].dt.year
    od["cents"] = (od["o_totalprice"] * 100).round().astype(int)
    cohort = od.groupby("o_custkey")["yr"].min().rename("cohort")
    sizes = cohort.value_counts().to_dict()
    j = od.join(cohort, on="o_custkey")
    j["age"] = j["yr"] - j["cohort"]
    rev = j.groupby(["cohort", "age"])["cents"].sum()
    expected = {}
    for ch in sorted(set(cohort)):
        cum = 0
        ages = sorted(a for (c, a) in rev.index if c == ch)
        for a in ages:
            cum += int(rev[(ch, a)])
            expected[(ch, a)] = (
                sizes[ch],
                cum,
                round(cum / (sizes[ch] * 100), 6),
            )

    out = queries()["window_ltv_triangle"](spark, sf_dir).collect()
    assert len(out) == len(expected) > 0
    for r in out:
        n, cum, ltv = expected[(r["cohort"], r["age"])]
        assert (r["n_customers"], r["cum_cents"]) == (n, cum)
        assert r["ltv_per_customer"] == pytest.approx(ltv, abs=1.1e-6)


def test_lexical_diversity_vs_pure_python(spark, sf_dir):
    import re

    from gisaid_pipeline_functions_spark.registry import queries

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    stats: dict = {}
    for src, text in zip(docs["source"], docs["text"]):
        toks = [t for t in re.split(r"\s+", text) if t]
        n, types = stats.get(src, (0, set()))
        types = types | set(toks)
        stats[src] = (n + len(toks), types)

    out = queries()["text_lexical_diversity"](spark, sf_dir).collect()
    assert len(out) == len(stats) > 0
    for r in out:
        n, types = stats[r["source"]]
        assert (r["n_tokens"], r["n_types"]) == (n, len(types))
        assert r["ttr"] == pytest.approx(len(types) / n, abs=1e-6)
        assert r["root_ttr"] == pytest.approx(
            len(types) / math.sqrt(n), abs=1e-6
        )


def _lpa_labels_py(edges):
    """Four synchronous LPA rounds as a dict loop (the
    test_label_propagation_vs_pure_python recursion, factored for the
    modularity check)."""
    from collections import Counter

    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    labels = {v: v for v in nbrs}
    for _ in range(4):
        labels = {
            v: min(
                Counter(labels[w] for w in ns).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v, ns in nbrs.items()
        }
    return nbrs, labels


def test_kcore_vs_pure_python(spark, sf_dir):
    """Four k=10 peeling rounds as a set loop — integer-only (degree
    count, both-endpoint survival), so surviving vertices and residual
    degrees must match EXACTLY (VERDICT r10 #3: third implementation
    for the shared two-engine peel replay)."""
    from collections import Counter

    from gisaid_pipeline_functions_spark.registry import queries

    e = set(_copurchase_edges_py(sf_dir))
    for _ in range(4):
        deg = Counter()
        for u, v in e:
            deg[u] += 1
            deg[v] += 1
        keep = {x for x, d in deg.items() if d >= 10}
        e = {(u, v) for u, v in e if u in keep and v in keep}
    deg = Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1

    out = queries()["graph_kcore"](spark, sf_dir).collect()
    assert {(r["vertex"], r["degree"]) for r in out} == set(deg.items())


def test_hits_vs_pure_python(spark, sf_dir):
    """Four HITS power-method rounds as dict loops over the bipartite
    customer→part purchase graph — the iteration is EXACT-integer
    (deferred L1 normalization), so only the single final quotient is
    inexact; both engines divide the same exact integers, leaving one
    6dp lattice unit of slack (VERDICT r10 #3)."""
    from gisaid_pipeline_functions_spark.registry import queries

    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    li = li[li["l_quantity"] >= 45]
    orders = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    edges = {
        (int(c), int(p)) for c, p in zip(m["o_custkey"], m["l_partkey"])
    }
    assert edges
    h = {u: 1 for u, _ in edges}
    a: dict[int, int] = {}
    for _ in range(4):
        a = {}
        for u, v in edges:
            a[v] = a.get(v, 0) + h[u]
        h = {}
        for u, v in edges:
            h[u] = h.get(u, 0) + a[v]
    hn, an = sum(h.values()), sum(a.values())
    expected = {
        (u, "hub"): _round6_half_up(s / hn) for u, s in h.items()
    } | {(v, "authority"): _round6_half_up(s / an) for v, s in a.items()}

    out = queries()["graph_hits"](spark, sf_dir).collect()
    assert len(out) == len(expected)
    for row in out:
        assert row["score"] == pytest.approx(
            expected[(row["vertex"], row["role"])], abs=1.1e-6
        )


def test_modularity_vs_pure_python(spark, sf_dir):
    """Newman modularity of the LPA partition from exact arbitrary-
    precision integers: Q = Σ_c(4m·L_c − d_c²) / (4m²) with L_c/d_c
    recomputed by dict loops over the raw edge set — both engines then
    perform the identical int→double conversion and one IEEE division,
    so Q matches to a 6dp lattice unit (VERDICT r10 #3)."""
    from gisaid_pipeline_functions_spark.registry import queries

    edges = set(_copurchase_edges_py(sf_dir))
    nbrs, labels = _lpa_labels_py(edges)
    m = len(edges)
    lc: dict[int, int] = {}
    for u, v in edges:
        if labels[u] == labels[v]:
            lc[labels[u]] = lc.get(labels[u], 0) + 1
    dc: dict[int, int] = {}
    for v, ns in nbrs.items():
        dc[labels[v]] = dc.get(labels[v], 0) + len(ns)
    q_num = sum(4 * m * lc.get(c, 0) - d * d for c, d in dc.items())
    q = _round6_half_up(q_num / (4 * m * m))

    row = queries()["graph_modularity"](spark, sf_dir).collect()[0]
    assert row["m"] == m
    assert row["n_communities"] == len(dc)
    assert row["q_modularity"] == pytest.approx(q, abs=1.1e-6)


def test_incremental_ivf_vs_pure_python(spark, sf_dir):
    """Third implementation of the resumable-IVF assignment (r14): the
    Spark query and its DuckDB oracle deliberately replay the SAME
    6dp-lattice Lloyd recursion, so this recomputes it with plain dict
    loops over the raw parquet — first-k init, per-dim means rounded to
    6dp each round (math.fsum — exact accumulation), assignment by
    round-6 squared L2 with cell-id tie-break, quantizer FROZEN after
    training on the base batch (ids ≤ the 80th id percentile), delta
    assigned against the frozen centroids — and compares the per-cell
    base/delta counts and id checksums EXACTLY (the outputs are integer;
    the float lattice only steers the discrete assignment)."""
    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }
    mx = max(vecs)
    cut = mx * 4 // 5
    base_ids = sorted(i for i in vecs if i <= cut)

    def d2(v, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(v, c)), 6)

    cents = {i: [round(x, 6) for x in vecs[i]] for i in base_ids[:4]}
    for _ in range(2):
        assign = {
            i: min(cents, key=lambda cl: (d2(vecs[i], cents[cl]), cl))
            for i in base_ids
        }
        cents = {
            cl: [
                round(math.fsum(col) / len(members), 6)
                for col in zip(*members)
            ]
            for cl in set(assign.values())
            for members in [[vecs[i] for i in base_ids if assign[i] == cl]]
        }
    final = {
        i: min(cents, key=lambda cl: (d2(vecs[i], cents[cl]), cl))
        for i in vecs
    }

    expected = {}
    for cl in set(final.values()):
        b = [i for i, c in final.items() if c == cl and i <= cut]
        d = [i for i, c in final.items() if c == cl and i > cut]
        expected[cl] = (len(b), len(d), sum(b), sum(d))
    got = {
        r["cell"]: (
            r["n_base"], r["n_delta"], r["id_sum_base"], r["id_sum_delta"]
        )
        for r in queries()["sim_incremental_ivf"](spark, sf_dir).collect()
    }
    assert got == expected


def test_ivf_drift_vs_pure_python(spark, sf_dir):
    """Third implementation of the drift monitor's means (r14): replays
    the frozen-Lloyd recursion exactly as the incremental-IVF check
    above, then recomputes each cell's base/delta mean assignment
    distance from EXACT integer micro-unit sums (round-6 lattice × 1e6
    is an exact int; plain-Python ints never lose a unit) and compares
    the counts exactly and the means to the one-division lattice
    unit."""
    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }
    mx = max(vecs)
    cut = mx * 4 // 5
    base_ids = sorted(i for i in vecs if i <= cut)

    def d2(v, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(v, c)), 6)

    cents = {i: [round(x, 6) for x in vecs[i]] for i in base_ids[:4]}
    for _ in range(2):
        assign = {
            i: min(cents, key=lambda cl: (d2(vecs[i], cents[cl]), cl))
            for i in base_ids
        }
        cents = {
            cl: [
                round(math.fsum(col) / len(members), 6)
                for col in zip(*members)
            ]
            for cl in set(assign.values())
            for members in [[vecs[i] for i in base_ids if assign[i] == cl]]
        }

    stats: dict[tuple[int, bool], tuple[int, int]] = {}
    for i in vecs:
        cl = min(cents, key=lambda c: (d2(vecs[i], cents[c]), c))
        key = (cl, i <= cut)
        n, sm = stats.get(key, (0, 0))
        stats[key] = (n + 1, sm + round(d2(vecs[i], cents[cl]) * 1e6))

    rows = queries()["sim_ivf_drift"](spark, sf_dir).collect()
    # full-outer completeness (r15): every populated cell — base-only,
    # delta-only, or both — appears exactly once
    assert sorted(r["cell"] for r in rows) == sorted(
        {cl for cl, _is_base in stats}
    )
    for r in rows:
        nb, sb = stats.get((r["cell"], True), (0, 0))
        nd, sd = stats.get((r["cell"], False), (0, 0))
        assert r["n_base"] == nb and r["n_delta"] == nd
        if nb:
            assert r["base_mean_dist"] == pytest.approx(
                sb / (nb * 1e6), abs=1.1e-6
            )
        else:
            assert r["base_mean_dist"] is None
        if nd:
            assert r["delta_mean_dist"] == pytest.approx(
                sd / (nd * 1e6), abs=1.1e-6
            )
        else:
            assert r["delta_mean_dist"] is None


def test_incremental_pq_vs_pure_python(spark, sf_dir):
    """Third implementation of the resumable-PQ quantization (r15): the
    Spark query and its DuckDB oracle deliberately replay the SAME
    per-subspace 6dp-lattice Lloyd recursion, so this recomputes it
    with plain dict loops over the raw parquet — per 32-dim slice:
    first-k init, per-dim means rounded to 6dp each round (math.fsum),
    assignment by round-6 squared L2 with cell-id tie-break, codebooks
    FROZEN after training on the base batch (ids ≤ the 80th id
    percentile), delta slices assigned against the frozen centroids —
    and compares the per-(subspace, cell) counts and id checksums
    EXACTLY (integer outputs; the float lattice only steers the
    discrete assignment)."""
    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }
    mx = max(vecs)
    cut = mx * 4 // 5
    base_ids = sorted(i for i in vecs if i <= cut)

    def d2(v, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(v, c)), 6)

    expected = {}
    for j in (0, 1):
        sl = {i: v[j * 32 : (j + 1) * 32] for i, v in vecs.items()}
        cents = {i: [round(x, 6) for x in sl[i]] for i in base_ids[:4]}
        for _ in range(2):
            assign = {
                i: min(cents, key=lambda cl: (d2(sl[i], cents[cl]), cl))
                for i in base_ids
            }
            cents = {
                cl: [
                    round(math.fsum(col) / len(members), 6)
                    for col in zip(*members)
                ]
                for cl in set(assign.values())
                for members in [
                    [sl[i] for i in base_ids if assign[i] == cl]
                ]
            }
        final = {
            i: min(cents, key=lambda cl: (d2(sl[i], cents[cl]), cl))
            for i in sl
        }
        for cl in set(final.values()):
            b = [i for i, c in final.items() if c == cl and i <= cut]
            d = [i for i, c in final.items() if c == cl and i > cut]
            expected[(j, cl)] = (len(b), len(d), sum(b), sum(d))

    got = {
        (r["subspace"], r["cell"]): (
            r["n_base"], r["n_delta"], r["id_sum_base"], r["id_sum_delta"]
        )
        for r in queries()["sim_incremental_pq"](spark, sf_dir).collect()
    }
    assert got == expected


def test_ivfpq_codes_vs_pure_python(spark, sf_dir):
    """Third implementation of the IVF-PQ residual encoding (r15): the
    Spark query and its DuckDB oracle deliberately replay the SAME
    Lloyd recursions (coarse 64-dim, then per-subspace over the
    residuals), so this recomputes the whole composition with plain
    dict loops — coarse first-k init / 6dp-lattice rounds / round-6
    L2 assignment, residual = raw double − 6dp-lattice centroid
    (element-wise IEEE subtract, no summation → order-free), then the
    identical recursion per 32-dim residual slice — and compares every
    (vec_id, cell, subspace, pq_cell) EXACTLY plus the residual
    assignment distances to the 6dp lattice unit."""
    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }

    def d2(v, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(v, c)), 6)

    def lloyd(points, k=4, iterations=2):
        """points: {id: vector}; returns the trained centroid dict."""
        ids = sorted(points)
        cents = {i: [round(x, 6) for x in points[i]] for i in ids[:k]}
        for _ in range(iterations):
            assign = {
                i: min(cents, key=lambda cl: (d2(points[i], cents[cl]), cl))
                for i in ids
            }
            cents = {
                cl: [
                    round(math.fsum(col) / len(members), 6)
                    for col in zip(*members)
                ]
                for cl in set(assign.values())
                for members in [
                    [points[i] for i in ids if assign[i] == cl]
                ]
            }
        return cents

    coarse = lloyd(vecs, k=4, iterations=2)
    cell_of = {
        i: min(coarse, key=lambda cl: (d2(vecs[i], coarse[cl]), cl))
        for i in vecs
    }
    res = {
        i: [x - y for x, y in zip(vecs[i], coarse[cell_of[i]])]
        for i in vecs
    }

    expected = {}
    for j in (0, 1):
        sl = {i: r[j * 32 : (j + 1) * 32] for i, r in res.items()}
        cb = lloyd(sl, k=4, iterations=2)
        for i in sl:
            pq = min(cb, key=lambda cl: (d2(sl[i], cb[cl]), cl))
            expected[(i, j)] = (cell_of[i], pq, d2(sl[i], cb[pq]))

    rows = queries()["sim_ivfpq_codes"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        cell, pq, dist = expected[(r["vec_id"], r["subspace"])]
        assert r["cell"] == cell and r["pq_cell"] == pq
        assert r["dist"] == pytest.approx(dist, abs=1.1e-6)


def test_incremental_ivfpq_vs_pure_python(spark, sf_dir):
    """Third implementation of the resumable IVF-PQ encoding (r15): the
    Spark query and its DuckDB oracle deliberately replay the SAME
    composition (base-restricted coarse Lloyd → base residuals →
    per-subspace residual Lloyd → delta routed and encoded against
    BOTH frozen quantizers), so this recomputes it with plain dict
    loops over the raw parquet and compares the per-(coarse cell,
    subspace, pq_cell) counts and id checksums EXACTLY (integer
    outputs; the float lattices only steer the discrete codes)."""
    from gisaid_pipeline_functions_spark.registry import queries

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }
    mx = max(vecs)
    cut = mx * 4 // 5
    base_ids = sorted(i for i in vecs if i <= cut)

    def d2(v, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(v, c)), 6)

    def lloyd(points, ids, k=4, iterations=2):
        """Train on ``ids`` only; returns the trained centroid dict."""
        ids = sorted(ids)
        cents = {i: [round(x, 6) for x in points[i]] for i in ids[:k]}
        for _ in range(iterations):
            assign = {
                i: min(cents, key=lambda cl: (d2(points[i], cents[cl]), cl))
                for i in ids
            }
            cents = {
                cl: [
                    round(math.fsum(col) / len(members), 6)
                    for col in zip(*members)
                ]
                for cl in set(assign.values())
                for members in [
                    [points[i] for i in ids if assign[i] == cl]
                ]
            }
        return cents

    # coarse quantizer trained on the BASE batch, frozen; EVERY vector
    # (base and delta) routes against it and yields a residual
    coarse = lloyd(vecs, base_ids, k=4, iterations=2)
    cell_of = {
        i: min(coarse, key=lambda cl: (d2(vecs[i], coarse[cl]), cl))
        for i in vecs
    }
    res = {
        i: [x - y for x, y in zip(vecs[i], coarse[cell_of[i]])]
        for i in vecs
    }

    # residual codebooks trained on the BASE residuals, frozen; every
    # residual slice (base and delta) assigns against them
    expected: dict[tuple[int, int, int], tuple[int, int, int, int]] = {}
    for j in (0, 1):
        sl = {i: r[j * 32 : (j + 1) * 32] for i, r in res.items()}
        cb = lloyd(sl, base_ids, k=4, iterations=2)
        code = {
            i: min(cb, key=lambda cl: (d2(sl[i], cb[cl]), cl)) for i in sl
        }
        for (cell, pq) in {(cell_of[i], code[i]) for i in sl}:
            b = [
                i for i in sl
                if cell_of[i] == cell and code[i] == pq and i <= cut
            ]
            d = [
                i for i in sl
                if cell_of[i] == cell and code[i] == pq and i > cut
            ]
            expected[(cell, j, pq)] = (len(b), len(d), sum(b), sum(d))

    got = {
        (r["cell"], r["subspace"], r["pq_cell"]): (
            r["n_base"], r["n_delta"], r["id_sum_base"], r["id_sum_delta"]
        )
        for r in queries()["sim_incremental_ivfpq"](spark, sf_dir).collect()
    }
    assert got == expected
