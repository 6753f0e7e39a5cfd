"""Time-series query registrations (SURVEY §2.7 W1–W7)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.timeseries import (
    counts_by_region_rollup,
    weekly_combination_frequency,
    weekly_frequency,
    weekly_percentage,
    weekly_totals,
    with_week_labels,
)
from ..registry import register
from ..sources.tables import load_table

# DuckDB Sunday-anchored week start: dayofweek() is 0=Sunday..6=Saturday.
_WEEK = "CAST({ts} AS DATE) - CAST(dayofweek({ts}) AS INTEGER)"


@register(
    "ts_weekly_freq_matrix",
    # W2 — per-week per-key frequency plus the synthetic Total_Genomes row
    # (Time_Series.py:731–788, 738), long form; one grouped pass + a tiny
    # union instead of the reference's per-week rescan loop.
    f"""
    WITH base AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, event_type AS key FROM events
    )
    SELECT week_start, key, count(*) AS freq FROM base GROUP BY 1, 2
    UNION ALL
    SELECT week_start, 'Total_Genomes' AS key, count(*) AS freq
    FROM base GROUP BY 1
    """,
)
def ts_weekly_freq_matrix(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    freq = weekly_frequency(events, "ts", "event_type")
    totals = weekly_totals(events, "ts").select(
        "week_start", F.lit("Total_Genomes").alias("key"), F.col("total").alias("freq")
    )
    return freq.unionByName(totals)


@register(
    "ts_weekly_percentage",
    # W4 — window-aggregate normalization with zero-guard
    # (Time_Series.py:790–811).
    f"""
    WITH freq AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, event_type AS key,
             count(*) AS freq
      FROM events GROUP BY 1, 2
    )
    SELECT week_start, key, freq,
           round(CASE WHEN sum(freq) OVER (PARTITION BY week_start) = 0 THEN 0.0
                 ELSE freq * 1.0 / sum(freq) OVER (PARTITION BY week_start) END,
                 6) AS pct
    FROM freq
    """,
)
def ts_weekly_percentage(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = weekly_percentage(weekly_frequency(events, "ts", "event_type"))
    return out.withColumn("pct", F.round("pct", 6))


@register(
    "ts_weekly_combinations",
    # W3 — per-week combination frequencies keyed by the comma-joined
    # sorted set of a user's event types that week (Time_Series.py:927–987).
    f"""
    WITH per_user AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, user_id,
             array_to_string(list_sort(list(DISTINCT event_type)), ',') AS combo
      FROM events GROUP BY 1, 2
    )
    SELECT week_start, combo, count(*) AS freq
    FROM per_user GROUP BY 1, 2
    """,
)
def ts_weekly_combinations(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy(
        sunday_week_start(F.col("ts")).alias("week_start"), "user_id"
    ).agg(F.collect_set("event_type").alias("types"))
    return weekly_combination_frequency(per_user, "week_start", "types")


@register(
    "ts_region_rollup",
    # W5 — counts per region per week + Worldwide rollup in one grouped
    # pass (Time_Series.py:839–909's per-continent loop → grouping sets).
    f"""
    WITH base AS (
      SELECT r.r_name AS region,
             {_WEEK.format(ts='o.o_orderdate')} AS week_start
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT coalesce(region, 'Worldwide') AS region, week_start,
           count(*) AS n
    FROM base GROUP BY GROUPING SETS ((region, week_start), (week_start))
    """,
)
def ts_region_rollup(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("o_orderdate").alias("ts"))
    )
    return counts_by_region_rollup(base, "ts", "region", total_label="Worldwide")


@register(
    "ts_week_labels_trimmed",
    # W6/W7 — dense week numbering, the reference's label format
    # (Time_Series.py:772), and leading/trailing-week trim
    # (Sequence_Counter.py:229–238).
    f"""
    WITH freq AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, count(*) AS freq
      FROM events GROUP BY 1
    ), numbered AS (
      SELECT week_start, freq,
             CAST(dense_rank() OVER (ORDER BY week_start) AS INT) AS week_number
      FROM freq
    )
    SELECT week_start, freq, week_number,
           format('Week{{}} ({{}}-{{}})', week_number,
                  strftime(week_start, '%m/%d/%Y'),
                  strftime(week_start + 6, '%m/%d/%Y')) AS week_label
    FROM numbered
    WHERE week_number > 1 AND week_number < (SELECT max(week_number) FROM numbered)
    """,
)
def ts_week_labels_trimmed(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    labeled = with_week_labels(weekly_totals(events, "ts").withColumnRenamed("total", "freq"))
    # global-max via an empty-partition window keeps the trim inside ONE
    # lazy plan (no driver .collect() action). The unpartitioned window is
    # fine here: its input is the per-week aggregate (weeks, not rows).
    w_all = Window.partitionBy()
    return (
        labeled.withColumn("_max_wn", F.max("week_number").over(w_all))
        .filter((F.col("week_number") > 1) & (F.col("week_number") < F.col("_max_wn")))
        .select("week_start", "freq", "week_number", "week_label")
    )


@register(
    "ts_zero_week_spine",
    # W1 + zero-count weeks — generated Sunday spine over a fixed range,
    # left join, coalesce 0 (Time_Series.py:707–715, 757–761). The range
    # extends past the data on both ends to force zero rows.
    f"""
    WITH spine AS (
      SELECT unnest(generate_series(
        DATE '2023-12-01' - CAST(dayofweek(DATE '2023-12-01') AS INTEGER),
        DATE '2024-03-31', INTERVAL 7 DAY))::DATE AS week_start
    ), freq AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, count(*) AS freq
      FROM events GROUP BY 1
    )
    SELECT s.week_start, coalesce(f.freq, 0) AS freq
    FROM spine s LEFT JOIN freq f ON s.week_start = f.week_start
    """,
)
def ts_zero_week_spine(spark, sf_dir):
    from ..functions.weeks import week_spine

    events = load_table(spark, sf_dir, "events")
    spine = week_spine(spark, "2023-12-01", "2024-03-31")
    freq = weekly_totals(events, "ts").withColumnRenamed("total", "freq")
    return (
        spine.join(freq, "week_start", "left")
        .select("week_start", F.coalesce("freq", F.lit(0)).alias("freq"))
    )


@register(
    "heatmap_table",
    # K5's DATA input driver-gated (VERDICT r3 #9): the weekly-percentage
    # long table + the per-key min–max gradient shade exactly as the
    # styled-Excel sink normalizes it (plans/heatmap.py:gradient_shades;
    # reference Time_Series.py:813–837 background_gradient). Only the
    # literal paint calls (openpyxl Styler) remain outside the hash.
    f"""
    WITH freq AS (
      SELECT {_WEEK.format(ts='ts')} AS week_start, event_type AS key,
             count(*) AS freq
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT week_start, key,
             round(CASE WHEN sum(freq) OVER (PARTITION BY week_start) = 0
                   THEN 0.0
                   ELSE freq * 1.0 / sum(freq) OVER (PARTITION BY week_start)
                   END, 6) AS pct
      FROM freq
    )
    SELECT week_start, key, pct,
           'q' || CAST(CASE WHEN max(pct) OVER (PARTITION BY key)
                             = min(pct) OVER (PARTITION BY key) THEN 0
                  ELSE least(CAST(floor((pct - min(pct) OVER (PARTITION BY key))
                                  * 4 / (max(pct) OVER (PARTITION BY key)
                                         - min(pct) OVER (PARTITION BY key)))
                             AS INT), 3) END AS VARCHAR) AS shade
    FROM p
    """,
)
def heatmap_table(spark, sf_dir):
    from ..plans.heatmap import gradient_shades

    events = load_table(spark, sf_dir, "events")
    pct = weekly_percentage(weekly_frequency(events, "ts", "event_type"))
    pct = pct.withColumn("pct", F.round("pct", 6)).drop("freq")
    return gradient_shades(pct, key_col="key", value_col="pct", buckets=4)


@register(
    "ts_seasonality_index",
    # Day-of-week seasonality index (the load-shape decomposition every
    # capacity planner runs; r8): per weekday event count vs the uniform
    # 1/7 expectation — index = n_dow · 7 / N (counts only, one fixed
    # division rounded 6) — plus the weekday's 6dp mean value. Weekday
    # keys are English day NAMES on both engines (Spark date_format
    # 'EEEE' ≡ DuckDB dayname — integer dow codes DIFFER between the
    # two: Spark 1=Sunday, DuckDB 0=Sunday).
    """
    WITH d AS (
      SELECT dayname(ts) AS weekday, count(*) AS n,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n) AS total FROM d)
    SELECT weekday, CAST(n AS BIGINT) AS n,
           round(n * 7.0 / total, 6) AS seasonality_index,
           avg_value
    FROM d, t
    """,
)
def ts_seasonality_index(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_format("ts", "EEEE").alias("weekday")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    t = d.agg(F.sum("n").alias("total"))
    return d.crossJoin(F.broadcast(t)).select(
        "weekday",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * 7.0 / F.col("total"), 6).alias("seasonality_index"),
        "avg_value",
    )


# CUSUM changepoint oracle — shared verbatim by ts_cusum_changepoint
# and its streaming twin (queries/advanced.py:streaming_cusum_hash) so
# the walk and the tie rule can never drift between them.
_CUSUM_ORACLE = """
    WITH wk AS (
      SELECT event_type,
             CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS week_start,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, count(*) AS w, sum(n) AS total
          FROM wk GROUP BY 1),
    c AS (
      SELECT wk.event_type, week_start,
             sum(n * w - total) OVER (PARTITION BY wk.event_type
                                      ORDER BY week_start
                                      ROWS UNBOUNDED PRECEDING) AS cusum
      FROM wk JOIN t USING (event_type)
    ),
    p AS (
      SELECT event_type, week_start, cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, week_start) AS rn
      FROM c
    )
    SELECT event_type, week_start AS peak_week,
           CAST(cusum AS BIGINT) AS cusum_scaled
    FROM p WHERE rn = 1
    """


@register(
    "ts_cusum_changepoint",
    # CUSUM changepoint detection over the weekly series (Page 1954 —
    # the standard level-shift detector; r8): per event type, the
    # cumulative sum of deviations from the series mean, with the
    # arithmetic kept INTEGER by scaling — cusum_k = Σ_{i≤k}(nᵢ·W −
    # total) where W = weeks in the series (Σ deviations · W) — so the
    # running sum is order-independent and exact; the changepoint is the
    # |cusum| peak (earliest week on ties). Partitioned cumulative
    # window + per-type argmax; the per-type (W, total) frame is
    # key-cardinality-sized and broadcasts.
    _CUSUM_ORACLE,
)
def ts_cusum_changepoint(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type", sunday_week_start(F.col("ts")).alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = wk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("w"), F.sum("n").alias("total")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("week_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = wk.join(F.broadcast(t), "event_type").select(
        "event_type",
        "week_start",
        F.sum(F.col("n") * F.col("w") - F.col("total")).over(wc).alias("cusum"),
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "week_start"
    )
    return (
        c.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("week_start").alias("peak_week"),
            F.col("cusum").cast("long").alias("cusum_scaled"),
        )
    )


# Shared centered-daily-series CTEs for the spectral/autocorrelation
# family (ts_acf / ts_periodogram): per-key daily counts, a row_number
# index, and the EXACT-INTEGER centered value c = n·y − Σy (the value
# (y − ȳ) scaled by n, the ts_cusum_changepoint trick) so every
# downstream product/sum stays on BIGINT with zero float drift until
# one final deterministic division.
_CENTERED_DAILY_CTES = """
daily AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT key, y,
         row_number() OVER (PARTITION BY key ORDER BY day) AS rn
  FROM daily
),
st AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
  FROM idx GROUP BY key
),
cy AS (
  SELECT i.key, i.rn, st.n, (st.n * i.y - st.s) AS c
  FROM idx i JOIN st ON i.key = st.key
)
"""


@register(
    "ts_acf",
    # Sample autocorrelation function, lags 1..7, per event type over
    # the daily count series (the pre-model diagnostic every
    # forecasting pipeline runs — reference analogue: the weekly
    # prevalence trend checks around Time_Series.py:731).
    # r_k = Σ(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)²; multiplying through by n²
    # makes both sums pure-BIGINT (c = n·y − Σy), so numerator and
    # denominator are EXACT integers (|c|≲1e6, squares×90 days ≪ 2⁶³)
    # and the single final division is one deterministic IEEE op —
    # no float-sum order, no lattice midpoints. The daily rollup is
    # calendar-bounded (days × types), so every join below is
    # aggregate-sized and broadcast; scale-invariant in corpus rows.
    f"""
    WITH {_CENTERED_DAILY_CTES.strip()},
    den AS (
      SELECT key, CAST(sum(c * c) AS BIGINT) AS denom, max(n) AS n_days
      FROM cy GROUP BY key
    ),
    lg AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(lag)),
    num AS (
      SELECT a.key, lg.lag, CAST(sum(a.c * b.c) AS BIGINT) AS numer,
             CAST(count(*) AS BIGINT) AS pairs
      FROM cy a
      CROSS JOIN lg
      JOIN cy b ON b.key = a.key AND b.rn = a.rn - lg.lag
      GROUP BY 1, 2
    )
    SELECT n.key AS event_type, n.lag, n.pairs, d.n_days,
           CASE WHEN d.denom > 0
                THEN round(CAST(n.numer AS DOUBLE)
                           / CAST(d.denom AS DOUBLE), 6) END AS acf
    FROM num n JOIN den d ON n.key = d.key
    """,
)
def ts_acf(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("key").orderBy("day")
    idx = daily.select("key", "y", F.row_number().over(w).alias("rn"))
    st = idx.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    cy = idx.join(F.broadcast(st), "key").select(
        "key",
        "rn",
        "n",
        (F.col("n") * F.col("y") - F.col("s")).alias("c"),
    )
    den = cy.groupBy("key").agg(
        F.sum(F.col("c") * F.col("c")).alias("denom"),
        F.max("n").alias("n_days"),
    )
    lg = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    b = cy.select(
        F.col("key").alias("bkey"),
        F.col("rn").alias("brn"),
        F.col("c").alias("bc"),
    )
    num = (
        cy.crossJoin(F.broadcast(lg))
        .join(
            b,
            (F.col("bkey") == F.col("key"))
            & (F.col("brn") == F.col("rn") - F.col("lag")),
        )
        .groupBy("key", "lag")
        .agg(
            F.sum(F.col("c") * F.col("bc")).alias("numer"),
            F.count(F.lit(1)).alias("pairs"),
        )
    )
    return num.join(F.broadcast(den), "key").select(
        F.col("key").alias("event_type"),
        "lag",
        "pairs",
        "n_days",
        F.when(
            F.col("denom") > 0,
            F.round(
                F.col("numer").cast("double") / F.col("denom").cast("double"),
                6,
            ),
        ).alias("acf"),
    )


# Quantized trig lookup for ts_periodogram: cos/sin(2πr/p) for periods
# 3..10, scaled to the 1e-6 integer lattice. The SAME literal table is
# injected into the Spark plan (createDataFrame) and the DuckDB oracle
# (VALUES) — libm cos() differs by ulps across engines, so the trig
# NEVER evaluates inside either engine; every per-term product is
# BIGINT-exact and only the final normalization divides in doubles
# (identical expression trees → identical IEEE results).
def _trig_rows():
    import math

    rows = []
    for p in range(3, 11):
        for r in range(p):
            ang = 2.0 * math.pi * r / p
            rows.append(
                (
                    p,
                    r,
                    int(math.floor(math.cos(ang) * 1e6 + 0.5)),
                    int(math.floor(math.sin(ang) * 1e6 + 0.5)),
                )
            )
    return rows


_TRIG_ROWS = _trig_rows()
_TRIG_VALUES_SQL = ", ".join(
    f"({p}, {r}, {cu}, {su})" for p, r, cu, su in _TRIG_ROWS
)


@register(
    "ts_periodogram",
    # Discrete periodogram over the mean-centered daily count series,
    # candidate periods 3..10 days, per event type — the dominant-cycle
    # detector a seasonality-aware pipeline runs before picking a
    # seasonal window (companion to ts_seasonality_index's fixed m=7).
    # I(p) = ((Σc·cos_q)/1e6/n)² + ((Σc·sin_q)/1e6/n)²  all over n,
    # with c = n·y − Σy (exact-integer centering, see ts_acf) and
    # cos_q/sin_q the shared 1e-6-quantized literals — sums are
    # BIGINT-exact (≲1e14 ≪ 2⁵³ so even the double cast is exact),
    # then one identical-tree float normalization, round 6.
    # is_dominant marks the argmax period per key (computed on the
    # ROUNDED power in both engines, so ties agree bit-for-bit).
    f"""
    WITH {_CENTERED_DAILY_CTES.strip()},
    trig AS (
      SELECT * FROM (VALUES {_TRIG_VALUES_SQL}) AS t(p, r, cu, su)
    ),
    g AS (
      SELECT cy.key, t.p, max(cy.n) AS n,
             CAST(sum(cy.c * t.cu) AS BIGINT) AS c_u,
             CAST(sum(cy.c * t.su) AS BIGINT) AS s_u
      FROM cy JOIN trig t ON (cy.rn - 1) % t.p = t.r
      GROUP BY 1, 2
    ),
    pw AS (
      SELECT key, p, n,
             round(
               ((CAST(c_u AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
                * (CAST(c_u AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
                + (CAST(s_u AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
                * (CAST(s_u AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)))
               / CAST(n AS DOUBLE), 6) AS power
      FROM g
    )
    SELECT key AS event_type, p AS period, n AS n_days, power,
           power = max(power) OVER (PARTITION BY key) AS is_dominant
    FROM pw
    """,
)
def ts_periodogram(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("key").orderBy("day")
    idx = daily.select("key", "y", F.row_number().over(w).alias("rn"))
    st = idx.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    cy = idx.join(F.broadcast(st), "key").select(
        "key",
        "rn",
        "n",
        (F.col("n") * F.col("y") - F.col("s")).alias("c"),
    )
    trig = spark.createDataFrame(
        _TRIG_ROWS, "p int, r int, cu long, su long"
    )
    g = (
        cy.join(
            F.broadcast(trig),
            ((F.col("rn") - 1) % F.col("p")) == F.col("r"),
        )
        .groupBy("key", "p")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("c") * F.col("cu")).alias("c_u"),
            F.sum(F.col("c") * F.col("su")).alias("s_u"),
        )
    )
    nd = F.col("n").cast("double")
    cx = F.col("c_u").cast("double") / F.lit(1000000.0) / nd
    sx = F.col("s_u").cast("double") / F.lit(1000000.0) / nd
    pw = g.select(
        "key",
        "p",
        "n",
        F.round((cx * cx + sx * sx) / nd, 6).alias("power"),
    )
    wk = Window.partitionBy("key")
    return pw.select(
        F.col("key").alias("event_type"),
        F.col("p").alias("period"),
        F.col("n").alias("n_days"),
        "power",
        (F.col("power") == F.max("power").over(wk)).alias("is_dominant"),
    )


@register(
    "ts_ccf_pairs",
    # Cross-correlation function between every ordered pair of event
    # types (ka < kb), lags −3..3, over their COMMON daily index (inner
    # join on day, then row_number — lag is in common-sample space, not
    # calendar space; documented, matches how a monitoring pipeline
    # lead/lag-screens metric pairs). Same exact-integer centering as
    # ts_acf (c = n·v − Σv per pair), so numerator and the two
    # denominator power sums are BIGINT-exact; the only float ops are
    # one sqrt of a product of two exact-double casts (≲2⁵³ each) and
    # one division — identical trees both engines, round 6.
    f"""
    WITH daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    common AS (
      SELECT a.key AS ka, b.key AS kb, a.day,
             a.y AS ya, b.y AS yb,
             row_number() OVER (PARTITION BY a.key, b.key
                                ORDER BY a.day) AS rn
      FROM daily a JOIN daily b ON a.day = b.day AND a.key < b.key
    ),
    st AS (
      SELECT ka, kb, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ya) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb
      FROM common GROUP BY 1, 2
    ),
    cz AS (
      SELECT c.ka, c.kb, c.rn, st.n,
             (st.n * c.ya - st.sa) AS ca, (st.n * c.yb - st.sb) AS cb
      FROM common c JOIN st ON c.ka = st.ka AND c.kb = st.kb
    ),
    den AS (
      SELECT ka, kb, max(n) AS n_days,
             CAST(sum(ca * ca) AS BIGINT) AS da,
             CAST(sum(cb * cb) AS BIGINT) AS db
      FROM cz GROUP BY 1, 2
    ),
    lg AS (SELECT * FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) AS t(lag)),
    num AS (
      SELECT a.ka, a.kb, lg.lag,
             CAST(sum(a.ca * b.cb) AS BIGINT) AS numer,
             CAST(count(*) AS BIGINT) AS pairs
      FROM cz a
      CROSS JOIN lg
      JOIN cz b ON b.ka = a.ka AND b.kb = a.kb AND b.rn = a.rn - lg.lag
      GROUP BY 1, 2, 3
    )
    SELECT n.ka AS key_a, n.kb AS key_b, n.lag, n.pairs, d.n_days,
           CASE WHEN d.da > 0 AND d.db > 0
                THEN round(CAST(n.numer AS DOUBLE)
                           / sqrt(CAST(d.da AS DOUBLE)
                                  * CAST(d.db AS DOUBLE)), 6) END AS ccf
    FROM num n JOIN den d ON n.ka = d.ka AND n.kb = d.kb
    """,
)
def ts_ccf_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.select(
        F.col("key").alias("ka"), "day", F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("key").alias("kb"), F.col("day").alias("bday"),
        F.col("y").alias("yb"),
    )
    common = (
        a.join(b, (F.col("day") == F.col("bday")) & (F.col("ka") < F.col("kb")))
        .select(
            "ka", "kb", "day", "ya", "yb",
            F.row_number()
            .over(Window.partitionBy("ka", "kb").orderBy("day"))
            .alias("rn"),
        )
    )
    st = common.groupBy("ka", "kb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
    )
    cz = common.join(F.broadcast(st), ["ka", "kb"]).select(
        "ka", "kb", "rn", "n",
        (F.col("n") * F.col("ya") - F.col("sa")).alias("ca"),
        (F.col("n") * F.col("yb") - F.col("sb")).alias("cb"),
    )
    den = cz.groupBy("ka", "kb").agg(
        F.max("n").alias("n_days"),
        F.sum(F.col("ca") * F.col("ca")).alias("da"),
        F.sum(F.col("cb") * F.col("cb")).alias("db"),
    )
    lg = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    rhs = cz.select(
        F.col("ka").alias("rka"), F.col("kb").alias("rkb"),
        F.col("rn").alias("brn"), F.col("cb").alias("bcb"),
    )
    num = (
        cz.crossJoin(F.broadcast(lg))
        .join(
            rhs,
            (F.col("rka") == F.col("ka"))
            & (F.col("rkb") == F.col("kb"))
            & (F.col("brn") == F.col("rn") - F.col("lag")),
        )
        .groupBy("ka", "kb", "lag")
        .agg(
            F.sum(F.col("ca") * F.col("bcb")).alias("numer"),
            F.count(F.lit(1)).alias("pairs"),
        )
    )
    return num.join(F.broadcast(den), ["ka", "kb"]).select(
        F.col("ka").alias("key_a"),
        F.col("kb").alias("key_b"),
        "lag",
        "pairs",
        "n_days",
        F.when(
            (F.col("da") > 0) & (F.col("db") > 0),
            F.round(
                F.col("numer").cast("double")
                / F.sqrt(
                    F.col("da").cast("double") * F.col("db").cast("double")
                ),
                6,
            ),
        ).alias("ccf"),
    )


@register(
    "ts_holt_winters",
    # Additive Holt-Winters triple exponential smoothing, period m=7,
    # per event type over daily counts — the seasonal completion of the
    # ts_exponential_smoothing / ts_holt_linear family. Coefficients
    # 0.4/0.6 (level), 0.3/0.7 (trend), 0.2/0.8 (seasonal) written
    # literally on BOTH sides, and no power-of-two coefficient: an
    # EXACT-power-of-2 weight (0.5, 0.25) times a lattice value is
    # float-exact and can land precisely on the .5e-7 round-6 midpoint
    # where the engines disagree (the r9 holt lesson); inexact weights
    # keep results ~1e-12 off any midpoint, which both engines round
    # identically. Seed: l₇ = round(mean of first 7, 6), b₇ = 0,
    # s₁..₇ = round(yᵢ − l₇, 6); recursion from t=8 with every state
    # re-rounded to the 6dp lattice so the recursive-CTE oracle (which
    # carries the 7-slot seasonal ring as a LIST column, sliced+appended
    # per step) replays the Spark fold bit-for-bit. Keys with ≤7 days
    # emit nothing on either side. The fold is map-side over per-key
    # collected series (calendar-bounded, aggregate-sized).
    """
    WITH RECURSIVE daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT key, day, y,
             row_number() OVER (PARTITION BY key ORDER BY day) AS rn
      FROM daily
    ),
    seed AS (
      SELECT key,
             round(sum(CASE WHEN rn <= 7 THEN CAST(y AS DOUBLE) END)
                   / 7.0, 6) AS l0
      FROM idx GROUP BY key
    ),
    svec0 AS (
      SELECT i.key,
             list(round(CAST(i.y AS DOUBLE) - s.l0, 6) ORDER BY i.rn)
               AS sv
      FROM idx i JOIN seed s ON i.key = s.key
      WHERE i.rn <= 7
      GROUP BY i.key
    ),
    h(key, rn, day, y, l, b, sv) AS (
      SELECT i.key, i.rn, i.day, i.y, s.l0, CAST(0.0 AS DOUBLE), v.sv
      FROM idx i
      JOIN seed s ON i.key = s.key
      JOIN svec0 v ON i.key = v.key
      WHERE i.rn = 7
      UNION ALL
      SELECT i.key, i.rn, i.day, i.y,
             round(0.4 * (i.y - h.sv[1]) + 0.6 * (h.l + h.b), 6),
             round(0.3 * (round(0.4 * (i.y - h.sv[1])
                                + 0.6 * (h.l + h.b), 6) - h.l)
                   + 0.7 * h.b, 6),
             list_append(
               h.sv[2:],
               round(0.2 * (i.y - round(0.4 * (i.y - h.sv[1])
                                        + 0.6 * (h.l + h.b), 6))
                     + 0.8 * h.sv[1], 6))
      FROM idx i JOIN h ON i.key = h.key AND i.rn = h.rn + 1
    )
    SELECT key AS event_type, day, y, l AS level, b AS trend,
           sv[7] AS seasonal, round(l + b + sv[1], 6) AS forecast_next
    FROM h WHERE rn > 7
    """,
)
def ts_holt_winters(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("key"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    series = (
        daily.groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("day", "y"))).alias("s"))
        .filter(F.size("s") > 7)
    )
    head = F.slice(F.col("s"), 1, 7)
    with_seed = series.withColumn(
        "l0",
        F.round(
            F.aggregate(
                head, F.lit(0.0), lambda a, x: a + x["y"].cast("double")
            )
            / 7.0,
            6,
        ),
    ).withColumn(
        "sv0",
        F.transform(
            head, lambda x: F.round(x["y"].cast("double") - F.col("l0"), 6)
        ),
    )
    out_type = (
        "array<struct<day:date,y:bigint,l:double,b:double,"
        "seas:double,fc:double>>"
    )
    acc_type = (
        "struct<l:double,b:double,sv:array<double>,out:" + out_type + ">"
    )

    def step(acc, x):
        sprev = F.element_at(acc["sv"], 1)
        yt = x["y"].cast("double")
        lt = F.round(
            0.4 * (yt - sprev) + 0.6 * (acc["l"] + acc["b"]), 6
        )
        bt = F.round(0.3 * (lt - acc["l"]) + 0.7 * acc["b"], 6)
        st_ = F.round(0.2 * (yt - lt) + 0.8 * sprev, 6)
        fc = F.round(lt + bt + F.element_at(acc["sv"], 2), 6)
        return F.struct(
            lt.alias("l"),
            bt.alias("b"),
            F.concat(F.slice(acc["sv"], 2, 6), F.array(st_)).alias("sv"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["y"].alias("y"),
                        lt.alias("l"),
                        bt.alias("b"),
                        st_.alias("seas"),
                        fc.alias("fc"),
                    )
                ),
            ).alias("out"),
        )

    init = F.struct(
        F.col("l0").alias("l"),
        F.lit(0.0).alias("b"),
        F.col("sv0").alias("sv"),
        F.array().cast(out_type).alias("out"),
    ).cast(acc_type)
    tail = F.slice(F.col("s"), 8, F.size("s") - 7)
    folded = F.aggregate(tail, init, step)
    return (
        with_seed.select(
            "key", F.explode(folded["out"]).alias("r")
        ).select(
            F.col("key").alias("event_type"),
            F.col("r.day").alias("day"),
            F.col("r.y").alias("y"),
            F.col("r.l").alias("level"),
            F.col("r.b").alias("trend"),
            F.col("r.seas").alias("seasonal"),
            F.col("r.fc").alias("forecast_next"),
        )
    )


@register(
    "ts_dtw",
    # Dynamic-time-warping distance between the weekly click and
    # purchase count sequences (Sakoe & Chiba 1978) — the elastic
    # series-similarity measure used where pointwise distance breaks on
    # phase shift. ALL-INTEGER exact: |Δ| costs on BIGINT counts, the
    # classic O(n·m) lattice folded row by row, and the row's apparent
    # sequential dependence cur[j] = cost+min(prev,diag,cur[j-1])
    # removed by the min-plus prefix identity cur[j] = c[j] +
    # min_{k≤j}(a[k] − c[k]) (a = cost + min(up, diag), c = cost prefix
    # sums) so each row is a pure array comprehension both engines
    # replay bit-for-bit — Spark F.aggregate over the x-series with an
    # array-state row, DuckDB a recursive CTE carrying the row list.
    # INF sentinel 1e15 (path costs are ≤ Σcosts ≪ 1e15, no overflow:
    # INF + max cost ≪ 2⁶³). Series are calendar-bounded aggregates —
    # the whole fold is one map-side expression on a 1-row frame.
    """
    WITH RECURSIVE wkx AS (
      SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS w,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    wky AS (
      SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS w,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    sx AS (SELECT list(y ORDER BY w) AS xs FROM wkx),
    sy AS (SELECT list(y ORDER BY w) AS ys FROM wky),
    dims AS (
      SELECT xs, ys, CAST(len(xs) AS BIGINT) AS n,
             CAST(len(ys) AS BIGINT) AS m
      FROM sx CROSS JOIN sy
    ),
    dp(i, row) AS (
      SELECT 0,
             list_prepend(CAST(0 AS BIGINT),
                          [CAST(1000000000000000 AS BIGINT)
                           FOR j IN range(1, CAST(m AS INT) + 1)])
      FROM dims
      UNION ALL
      SELECT dp.i + 1,
             list_prepend(
               CAST(1000000000000000 AS BIGINT),
               [CAST(list_reduce(
                       list_slice([abs(d.xs[dp.i + 1] - yv)
                                   FOR yv IN d.ys], 1, j),
                       (p, q) -> p + q) AS BIGINT)
                + list_min(
                    list_slice(
                      [[abs(d.xs[dp.i + 1] - yv) FOR yv IN d.ys][k]
                       + least(dp.row[k + 1], dp.row[k])
                       - CAST(list_reduce(
                           list_slice([abs(d.xs[dp.i + 1] - yv)
                                       FOR yv IN d.ys], 1, k),
                           (p, q) -> p + q) AS BIGINT)
                       FOR k IN range(1, CAST(d.m AS INT) + 1)],
                      1, j))
                FOR j IN range(1, CAST(d.m AS INT) + 1)])
      FROM dp, dims d WHERE dp.i < d.n
    )
    SELECT d.n, d.m, dp.row[CAST(d.m AS INT) + 1] AS dtw_distance,
           round(CAST(dp.row[CAST(d.m AS INT) + 1] AS DOUBLE)
                 / CAST(d.n + d.m AS DOUBLE), 6) AS dtw_per_step
    FROM dp JOIN dims d ON dp.i = d.n
    """,
)
def ts_dtw(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    ev = load_table(spark, sf_dir, "events")

    def series(etype, alias):
        wk = (
            ev.filter(F.col("event_type") == etype)
            .groupBy(sunday_week_start(F.col("ts")).alias("w"))
            .agg(F.count(F.lit(1)).alias("y"))
        )
        return wk.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "y"))),
                lambda s: s["y"],
            ).alias(alias)
        )

    INF = F.lit(1000000000000000).cast("long")
    both = series("click", "xs").crossJoin(series("purchase", "ys"))
    m = F.size("ys")
    row0 = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(F.sequence(F.lit(1), m), lambda j: INF),
    )

    def step(prev, xi):
        cost = F.transform(F.col("ys"), lambda yv: F.abs(xi - yv))
        csum = F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.aggregate(
                F.slice(cost, F.lit(1), j),
                F.lit(0).cast("long"),
                lambda p, q: p + q,
            ),
        )
        amc = F.transform(
            F.sequence(F.lit(1), m),
            lambda k: F.element_at(cost, k)
            + F.least(F.element_at(prev, k + 1), F.element_at(prev, k))
            - F.element_at(csum, k),
        )
        cur = F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.element_at(csum, j)
            + F.array_min(F.slice(amc, F.lit(1), j)),
        )
        return F.concat(F.array(INF), cur)

    final = both.select(
        F.size("xs").cast("long").alias("n"),
        m.cast("long").alias("m"),
        F.element_at(
            F.aggregate(F.col("xs"), row0, step), F.size("ys") + 1
        ).alias("dtw_distance"),
    )
    return final.select(
        "n", "m", "dtw_distance",
        F.round(
            F.col("dtw_distance").cast("double")
            / (F.col("n") + F.col("m")).cast("double"),
            6,
        ).alias("dtw_per_step"),
    )


@register(
    "ts_granger_lite",
    # Lag-1 Granger-causality screen: does last week's purchase count
    # improve the prediction of this week's click count beyond last
    # week's clicks? Restricted model y_t ~ (1, y_{t-1}) vs full model
    # y_t ~ (1, y_{t-1}, x_{t-1}), both solved CLOSED-FORM by Cramer's
    # rule on the normal equations (the train_linreg_normal_eq
    # convention, one order up): every moment (n, Σy, Σa, Σb, Σa²,
    # Σb², Σab, Σay, Σby, Σy²) is an exact BIGINT over weekly counts,
    # the 3×3 determinants expand in DECIMAL(38,0), and each RSS is ONE
    # division of exact decimals — RSS_f = (Σy²·D − Nα·Σy − Nβ·Σay −
    # Nγ·Σby)/D. The F statistic is three IEEE ops on the two RSS
    # doubles. Lag alignment = the calendar join w+7d = w' (exactly
    # consecutive weeks; gaps drop the pair on both sides).
    """
    WITH wk AS (
      SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS w,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cl,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pu
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    pairs AS (
      SELECT cur.cl AS y, prev.cl AS a, prev.pu AS b
      FROM wk cur JOIN wk prev ON prev.w + 7 = cur.w
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(a) AS BIGINT) AS sa,
             CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(a * a) AS BIGINT) AS saa,
             CAST(sum(b * b) AS BIGINT) AS sbb,
             CAST(sum(a * b) AS BIGINT) AS sab,
             CAST(sum(a * y) AS BIGINT) AS say,
             CAST(sum(b * y) AS BIGINT) AS sby,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs
    ),
    dec AS (
      SELECT n, syy,
             CAST(n AS DECIMAL(38,0)) AS dn, CAST(sy AS DECIMAL(38,0)) AS dsy,
             CAST(sa AS DECIMAL(38,0)) AS dsa, CAST(sb AS DECIMAL(38,0)) AS dsb,
             CAST(saa AS DECIMAL(38,0)) AS dsaa,
             CAST(sbb AS DECIMAL(38,0)) AS dsbb,
             CAST(sab AS DECIMAL(38,0)) AS dsab,
             CAST(say AS DECIMAL(38,0)) AS dsay,
             CAST(sby AS DECIMAL(38,0)) AS dsby,
             CAST(syy AS DECIMAL(38,0)) AS dsyy
      FROM mo
    ),
    rss AS (
      SELECT n,
             CAST(dsyy AS DOUBLE)
               - CAST(dsy * (dsaa * dsy - dsa * dsay)
                      + dsay * (dn * dsay - dsa * dsy) AS DOUBLE)
                 / CAST(dn * dsaa - dsa * dsa AS DOUBLE) AS rss_r,
             CAST(dsyy * (dn * (dsaa * dsbb - dsab * dsab)
                           - dsa * (dsa * dsbb - dsab * dsb)
                           + dsb * (dsa * dsab - dsaa * dsb))
                   - (dsy * (dsaa * dsbb - dsab * dsab)
                      - dsa * (dsay * dsbb - dsab * dsby)
                      + dsb * (dsay * dsab - dsaa * dsby)) * dsy
                   - (dn * (dsay * dsbb - dsab * dsby)
                      - dsy * (dsa * dsbb - dsab * dsb)
                      + dsb * (dsa * dsby - dsay * dsb)) * dsay
                   - (dn * (dsaa * dsby - dsay * dsab)
                      - dsa * (dsa * dsby - dsay * dsb)
                      + dsy * (dsa * dsab - dsaa * dsb)) * dsby
                  AS DOUBLE)
                  / CAST(dn * (dsaa * dsbb - dsab * dsab)
                         - dsa * (dsa * dsbb - dsab * dsb)
                         + dsb * (dsa * dsab - dsaa * dsb) AS DOUBLE)
               AS rss_f
      FROM dec
    )
    SELECT n, round(rss_r, 6) AS rss_r, round(rss_f, 6) AS rss_f,
           round((rss_r - rss_f) / (rss_f / CAST(n - 3 AS DOUBLE)), 6)
             AS f_stat
    FROM rss
    """,
)
def ts_granger_lite(spark, sf_dir):
    from ..functions.weeks import sunday_week_start

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    wk = ev.groupBy(sunday_week_start(F.col("ts")).alias("w")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).alias("cl"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("pu"),
    )
    cur = wk.select(F.col("w"), F.col("cl").alias("y"))
    prev = wk.select(
        F.date_add("w", 7).alias("w"),
        F.col("cl").alias("a"),
        F.col("pu").alias("b"),
    )
    pairs = cur.join(F.broadcast(prev), "w")
    mo = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("y")).alias("say"),
        F.sum(F.col("b") * F.col("y")).alias("sby"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = {
        c: F.col(c).cast("decimal(38,0)")
        for c in ["n", "sy", "sa", "sb", "saa", "sbb", "sab", "say", "sby", "syy"]
    }
    rss_r = d["syy"].cast("double") - (
        d["sy"] * (d["saa"] * d["sy"] - d["sa"] * d["say"])
        + d["say"] * (d["n"] * d["say"] - d["sa"] * d["sy"])
    ).cast("double") / (d["n"] * d["saa"] - d["sa"] * d["sa"]).cast(
        "double"
    )
    det = (
        d["n"] * (d["saa"] * d["sbb"] - d["sab"] * d["sab"])
        - d["sa"] * (d["sa"] * d["sbb"] - d["sab"] * d["sb"])
        + d["sb"] * (d["sa"] * d["sab"] - d["saa"] * d["sb"])
    )
    n_alpha = (
        d["sy"] * (d["saa"] * d["sbb"] - d["sab"] * d["sab"])
        - d["sa"] * (d["say"] * d["sbb"] - d["sab"] * d["sby"])
        + d["sb"] * (d["say"] * d["sab"] - d["saa"] * d["sby"])
    )
    n_beta = (
        d["n"] * (d["say"] * d["sbb"] - d["sab"] * d["sby"])
        - d["sy"] * (d["sa"] * d["sbb"] - d["sab"] * d["sb"])
        + d["sb"] * (d["sa"] * d["sby"] - d["say"] * d["sb"])
    )
    n_gamma = (
        d["n"] * (d["saa"] * d["sby"] - d["say"] * d["sab"])
        - d["sa"] * (d["sa"] * d["sby"] - d["say"] * d["sb"])
        + d["sy"] * (d["sa"] * d["sab"] - d["saa"] * d["sb"])
    )
    rss_f = (
        d["syy"] * det
        - n_alpha * d["sy"]
        - n_beta * d["say"]
        - n_gamma * d["sby"]
    ).cast("double") / det.cast("double")
    return mo.select(
        "n",
        F.round(rss_r, 6).alias("rss_r"),
        F.round(rss_f, 6).alias("rss_f"),
        F.round(
            (rss_r - rss_f) / (rss_f / (F.col("n") - 3).cast("double")), 6
        ).alias("f_stat"),
    )


_MP_M = 4


@register(
    "ts_matrix_profile",
    # Matrix profile (Yeh et al., ICDM 2016 — the all-pairs z-normalized
    # nearest-neighbor distance that unified motif and anomaly
    # discovery) over the daily click-count series, window m=4,
    # exclusion zone |i-j| < m. The series is a calendar-bounded 1-row
    # array; every pairwise moment (sxy, sx, sxx...) is an exact BIGINT
    # fold over m elements, so each distance sqrt(2m·max(1-r, 0)) is
    # built from identical doubles on both engines (IEEE sqrt is
    # correctly rounded; the max(.,0) guards the r=1+ulp case where
    # perfectly correlated windows would take sqrt of a tiny negative).
    # Argmin per i ties -> lowest j. O(n^2 m) on the fixed-length
    # series — the corpus-scale work is ONE daily groupBy.
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    s AS (SELECT list(y ORDER BY day) AS a,
                 CAST(count(*) AS BIGINT) AS n FROM d),
    idx AS (
      SELECT a, n, i.i, j.j
      FROM s,
           LATERAL unnest(range(1, CAST(n - {_MP_M} + 2 AS INT))) i(i),
           LATERAL unnest(range(1, CAST(n - {_MP_M} + 2 AS INT))) j(j)
      WHERE abs(i.i - j.j) >= {_MP_M}
    ),
    mo AS (
      SELECT i, j,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               [a[CAST(i + k AS INT)] FOR k IN range(0, {_MP_M})]),
               (p, q) -> p + q) AS BIGINT) AS sx,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               [a[CAST(j + k AS INT)] FOR k IN range(0, {_MP_M})]),
               (p, q) -> p + q) AS BIGINT) AS sy,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               [a[CAST(i + k AS INT)] * a[CAST(i + k AS INT)]
                FOR k IN range(0, {_MP_M})]),
               (p, q) -> p + q) AS BIGINT) AS sxx,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               [a[CAST(j + k AS INT)] * a[CAST(j + k AS INT)]
                FOR k IN range(0, {_MP_M})]),
               (p, q) -> p + q) AS BIGINT) AS syy,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               [a[CAST(i + k AS INT)] * a[CAST(j + k AS INT)]
                FOR k IN range(0, {_MP_M})]),
               (p, q) -> p + q) AS BIGINT) AS sxy
      FROM idx
    ),
    dist AS (
      SELECT i, j,
             sqrt(2 * {_MP_M} * greatest(
               1 - CAST({_MP_M} * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST({_MP_M} * sxx - sx * sx AS DOUBLE)
                          * CAST({_MP_M} * syy - sy * sy AS DOUBLE)),
               0)) AS dd
      FROM mo
      WHERE {_MP_M} * sxx - sx * sx > 0 AND {_MP_M} * syy - sy * sy > 0
    ),
    best AS (
      SELECT i, j, dd,
             row_number() OVER (PARTITION BY i ORDER BY dd, j) AS rk
      FROM dist
    )
    SELECT CAST(i AS BIGINT) AS sub_idx, CAST(j AS BIGINT) AS nn_idx,
           round(dd, 6) AS nn_dist
    FROM best WHERE rk = 1
    """,
)
def ts_matrix_profile(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    s = d.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda r: r["y"],
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    m = _MP_M
    rng = F.sequence(F.lit(1), (F.col("n") - m + 1).cast("int"))
    idx = (
        s.select("a", "n", F.explode(rng).alias("i"))
        .select("a", "n", "i", F.explode(rng).alias("j"))
        .filter(F.abs(F.col("i") - F.col("j")) >= m)
    )

    def fold(vals):
        return F.aggregate(
            vals, F.lit(0).cast("long"), lambda p, q: p + q
        )

    ks = F.sequence(F.lit(0), F.lit(m - 1))
    ai = lambda k: F.element_at("a", (F.col("i") + k).cast("int"))  # noqa: E731
    aj = lambda k: F.element_at("a", (F.col("j") + k).cast("int"))  # noqa: E731
    mo = idx.select(
        "i",
        "j",
        fold(F.transform(ks, lambda k: ai(k))).alias("sx"),
        fold(F.transform(ks, lambda k: aj(k))).alias("sy"),
        fold(F.transform(ks, lambda k: ai(k) * ai(k))).alias("sxx"),
        fold(F.transform(ks, lambda k: aj(k) * aj(k))).alias("syy"),
        fold(F.transform(ks, lambda k: ai(k) * aj(k))).alias("sxy"),
    )
    var_i = m * F.col("sxx") - F.col("sx") * F.col("sx")
    var_j = m * F.col("syy") - F.col("sy") * F.col("sy")
    r = (m * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / F.sqrt(var_i.cast("double") * var_j.cast("double"))
    dd = F.sqrt(2 * m * F.greatest(1 - r, F.lit(0.0)))
    dist = mo.filter((var_i > 0) & (var_j > 0)).select(
        "i", "j", dd.alias("dd")
    )
    w = Window.partitionBy("i").orderBy("dd", "j")
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("i").cast("long").alias("sub_idx"),
            F.col("j").cast("long").alias("nn_idx"),
            F.round("dd", 6).alias("nn_dist"),
        )
    )


@register(
    "ts_mann_kendall",
    # Mann-Kendall trend test over the daily click series — the
    # nonparametric significance twin of ts_theil_sen_trend (Mann 1945;
    # the pair every environmental/ops monitoring stack runs together).
    # S = sum of sign(y_j - y_i) over i<j is pure integer (435 pairs on
    # the calendar-bounded 30-day frame — the corpus-scale work is the
    # daily groupBy); the tie-corrected variance 18*Var(S) = n(n-1)(2n+5)
    # - sum t(t-1)(2t+5) stays integer, tau-b's denominator is one IEEE
    # sqrt of exact-integer products, and z applies the standard
    # continuity correction (S-1 or S+1) before ONE division.
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM d a JOIN d b ON a.day < b.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tv,
             CAST(coalesce(sum(t * (t - 1) / 2), 0) AS BIGINT) AS tp
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY y)
      WHERE t > 1
    )
    SELECT nn.n, s.s_stat,
           round(CAST(s.s_stat AS DOUBLE)
                 / sqrt(CAST(nn.n * (nn.n - 1) / 2 AS DOUBLE)
                        * CAST(nn.n * (nn.n - 1) / 2 - ties.tp AS DOUBLE)),
                 6) AS tau_b,
           round(CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                           WHEN s.s_stat < 0 THEN s.s_stat + 1
                           ELSE 0 END AS DOUBLE)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - ties.tv AS DOUBLE) / 18.0), 6) AS z_stat
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
)
def ts_mann_kendall(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    a = d.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = d.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    s = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat")
        )
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        d.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).cast("long").alias("tv"),
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) / 2), F.lit(0)
            ).cast("long").alias("tp"),
        )
    )
    n = F.col("n")
    half = (n * (n - 1) / 2).cast("long")
    zc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "s_stat",
            F.round(
                F.col("s_stat").cast("double")
                / F.sqrt(
                    half.cast("double")
                    * (half - F.col("tp")).cast("double")
                ),
                6,
            ).alias("tau_b"),
            F.round(
                zc.cast("double")
                / F.sqrt(
                    (
                        n * (n - 1) * (2 * n + 5) - F.col("tv")
                    ).cast("double")
                    / 18.0
                ),
                6,
            ).alias("z_stat"),
        )
    )


@register(
    "ts_intervention_impact",
    # Intervention impact, CausalImpact-lite (Brodersen et al. 2015
    # shape, OLS counterfactual instead of BSTS): fit purchases ~ a +
    # b*clicks on the PRE period (days 1-20) by the exact closed-form
    # normal equations (train_linreg_normal_eq convention: BIGINT
    # moments, DECIMAL(38,0) numerators, a and b each ONE division),
    # then the POST days' counterfactual, pointwise effect, and the
    # running cumulative effect. Effects are rounded to the 6dp lattice
    # BEFORE cumulating (the holt convention) and the cumsum runs in
    # unique-day order — the identical left-fold on both engines.
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM d WHERE day <= DATE '2024-01-20'
    ),
    ab AS (
      SELECT CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS b,
             n, sx, sy, sxx, sxy
      FROM mo
    ),
    ab2 AS (
      SELECT b,
             (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM ab
    ),
    post AS (
      SELECT d.day, d.y,
             round(a + b * CAST(d.x AS DOUBLE), 6) AS pred,
             round(CAST(d.y AS DOUBLE) - (a + b * CAST(d.x AS DOUBLE)), 6)
               AS effect
      FROM d CROSS JOIN ab2 WHERE d.day > DATE '2024-01-20'
    )
    SELECT day, y AS actual, pred, effect,
           round(sum(effect) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
                 6) AS cum_effect
    FROM post
    """,
)
def ts_intervention_impact(spark, sf_dir):
    from pyspark.sql import Window

    split = F.lit("2024-01-20").cast("date")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("y"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mo = d.filter(F.col("day") <= split).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    b = (d38("n") * F.col("sxy") - d38("sx") * F.col("sy")).cast(
        "double"
    ) / (d38("n") * F.col("sxx") - d38("sx") * F.col("sx")).cast(
        "double"
    )
    ab = mo.select(
        b.alias("b"),
        (
            (F.col("sy").cast("double") - b * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    post = d.filter(F.col("day") > split).crossJoin(
        F.broadcast(ab)
    ).select(
        "day",
        F.col("y").alias("actual"),
        F.round(F.col("a") + F.col("b") * F.col("x").cast("double"), 6)
        .alias("pred"),
        F.round(
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double")),
            6,
        ).alias("effect"),
    )
    # post window is calendar-bounded (days after the split) — tiny
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return post.select(
        "day",
        "actual",
        "pred",
        "effect",
        F.round(F.sum("effect").over(w), 6).alias("cum_effect"),
    )


@register(
    "ts_optimal_changepoints",
    # Optimal multi-changepoint segmentation (Jackson et al. 2005
    # optimal partitioning — the exact DP that PELT prunes; beside the
    # single-point CUSUM): minimize sum of per-segment L2 costs
    # C(a,b) = sumY2 - (sumY)^2/len plus a per-segment penalty beta =
    # total_cost/8, over the daily click series. Everything rides the
    # ts_dtw replay machinery: prefix sums as 1-row arrays (sumY BIGINT,
    # sumY2 DECIMAL(38,0)/HUGEINT — daily-count squares overflow int64
    # at corpus scale), the O(n^2) DP folded step by step with the F
    # and cp arrays as state (argmin ties -> lowest s via
    # first-occurrence list_position), then a second fold backtracks
    # the cp chain into segments. Costs are identical-tree doubles on
    # both engines, so every argmin agrees; segment means round(.,6)
    # (len <= 30 denominators cannot land on representable 1e-6
    # midpoints). Corpus-scale work is ONE daily groupBy.
    """
    WITH RECURSIVE d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    arr AS (
      SELECT list(y ORDER BY day) AS a,
             CAST(count(*) AS BIGINT) AS n FROM d
    ),
    pre AS (
      SELECT a, n,
             [list_reduce(list_prepend(CAST(0 AS BIGINT),
                                       list_slice(a, 1, k - 1)),
                          (p, q) -> p + q)
              FOR k IN range(1, CAST(n AS INT) + 2)] AS sp,
             [list_reduce(list_prepend(CAST(0 AS HUGEINT),
                list_slice([CAST(y AS HUGEINT) * y FOR y IN a], 1, k - 1)),
                          (p, q) -> p + q)
              FOR k IN range(1, CAST(n AS INT) + 2)] AS qp
      FROM arr
    ),
    pb AS (
      SELECT a, n, sp, qp,
             (CAST(qp[CAST(n AS INT) + 1] AS DOUBLE)
              - CAST(CAST(sp[CAST(n AS INT) + 1] AS HUGEINT)
                     * sp[CAST(n AS INT) + 1] AS DOUBLE)
                / CAST(n AS DOUBLE)) / 8.0 AS beta
      FROM pre
    ),
    dp AS (
      SELECT 0 AS t, [-beta] AS fs, [CAST(0 AS BIGINT)] AS cps FROM pb
      UNION ALL
      SELECT dp.t + 1,
        list_append(dp.fs, list_min(
          [dp.fs[s1]
           + CAST(p.qp[dp.t + 2] - p.qp[s1] AS DOUBLE)
           - CAST(CAST(p.sp[dp.t + 2] - p.sp[s1] AS HUGEINT)
                  * (p.sp[dp.t + 2] - p.sp[s1]) AS DOUBLE)
             / CAST(dp.t + 2 - s1 AS DOUBLE)
           + p.beta
           FOR s1 IN range(1, dp.t + 2)])),
        list_append(dp.cps, CAST(list_position(
          [dp.fs[s1]
           + CAST(p.qp[dp.t + 2] - p.qp[s1] AS DOUBLE)
           - CAST(CAST(p.sp[dp.t + 2] - p.sp[s1] AS HUGEINT)
                  * (p.sp[dp.t + 2] - p.sp[s1]) AS DOUBLE)
             / CAST(dp.t + 2 - s1 AS DOUBLE)
           + p.beta
           FOR s1 IN range(1, dp.t + 2)],
          list_min(
          [dp.fs[s1]
           + CAST(p.qp[dp.t + 2] - p.qp[s1] AS DOUBLE)
           - CAST(CAST(p.sp[dp.t + 2] - p.sp[s1] AS HUGEINT)
                  * (p.sp[dp.t + 2] - p.sp[s1]) AS DOUBLE)
             / CAST(dp.t + 2 - s1 AS DOUBLE)
           + p.beta
           FOR s1 IN range(1, dp.t + 2)])) - 1 AS BIGINT))
      FROM dp, pb p WHERE dp.t < p.n
    ),
    dpf AS (
      SELECT dp.cps, p.n, p.sp FROM dp, pb p WHERE dp.t = p.n
    ),
    bt AS (
      SELECT CAST(n AS BIGINT) AS e,
             cps[CAST(n AS INT) + 1] AS s
      FROM dpf WHERE n > 0
      UNION ALL
      SELECT bt.s AS e, d.cps[CAST(bt.s AS INT) + 1] AS s
      FROM bt, dpf d WHERE bt.s > 0
    )
    SELECT bt.s + 1 AS start_idx, bt.e AS end_idx,
           bt.e - bt.s AS n_days,
           CAST(d.sp[CAST(bt.e AS INT) + 1]
                - d.sp[CAST(bt.s AS INT) + 1] AS BIGINT) AS seg_sum,
           round(CAST(d.sp[CAST(bt.e AS INT) + 1]
                      - d.sp[CAST(bt.s AS INT) + 1] AS DOUBLE)
                 / CAST(bt.e - bt.s AS DOUBLE), 6) AS seg_mean
    FROM bt, dpf d
    """,
)
def ts_optimal_changepoints(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    arr = d.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda r: r["y"],
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    y2s = F.transform(F.col("a"), lambda y: d19(y) * d19(y))
    ks = F.sequence(F.lit(1), (F.col("n") + 1).cast("int"))
    pre = arr.select(
        "a",
        "n",
        F.transform(
            ks,
            lambda k: F.aggregate(
                F.slice(F.col("a"), F.lit(1), k - 1),
                F.lit(0).cast("long"),
                lambda p, q: p + q,
            ),
        ).alias("sp"),
        F.transform(
            ks,
            lambda k: F.aggregate(
                F.slice(y2s, F.lit(1), k - 1),
                F.lit(0).cast("decimal(38,0)"),
                lambda p, q: (p + q).cast("decimal(38,0)"),
            ),
        ).alias("qp"),
    )
    spn = F.element_at("sp", (F.col("n") + 1).cast("int"))
    qpn = F.element_at("qp", (F.col("n") + 1).cast("int"))
    pb = pre.select(
        "a",
        "n",
        "sp",
        "qp",
        (
            (
                qpn.cast("double")
                - (d19(spn) * d19(spn)).cast("double")
                / F.col("n").cast("double")
            )
            / 8.0
        ).alias("beta"),
    )

    def cands(fs, t):
        def one(s1):
            qd = F.element_at("qp", t + 2) - F.element_at("qp", s1)
            sd = F.element_at("sp", t + 2) - F.element_at("sp", s1)
            ln = (t + 2 - s1).cast("double")
            return (
                F.element_at(fs, s1)
                + qd.cast("double")
                - (d19(sd) * d19(sd)).cast("double") / ln
                + F.col("beta")
            )

        return F.transform(F.sequence(F.lit(1), t + 1), one)

    def dp_step(acc, t0):
        # t0 iterates 1..n; prior state has t0 entries (t = t0 - 1).
        # Interpreted HOF lambdas don't CSE: bind the candidate array
        # ONCE per step via a 1-element transform (the array would
        # otherwise inline 3x — min, position, and position's min arg —
        # the r7 hoist rule; measured ~2x on the whole DP)
        def finish(cs):
            fmin = F.array_min(cs)
            return F.struct(
                F.concat(acc["fs"], F.array(fmin)).alias("fs"),
                F.concat(
                    acc["cps"],
                    F.array(
                        (F.array_position(cs, fmin) - 1).cast("long")
                    ),
                ).alias("cps"),
            )

        return F.element_at(
            F.transform(
                F.array(cands(acc["fs"], t0 - 1)), lambda cs: finish(cs)
            ),
            1,
        )

    init = F.struct(
        F.array(-F.col("beta")).alias("fs"),
        F.array(F.lit(0).cast("long")).alias("cps"),
    )
    dpf = pb.select(
        "n",
        "sp",
        F.aggregate(
            F.sequence(F.lit(1), F.col("n").cast("int")), init, dp_step
        )["cps"].alias("cps"),
    )

    def bt_step(acc, _i):
        e = acc["e"]
        s = F.element_at("cps", (e + 1).cast("int"))
        return F.when(
            e > 0,
            F.struct(
                s.alias("e"),
                F.concat(
                    acc["segs"],
                    F.array(F.struct(s.alias("s"), e.alias("e"))),
                ).alias("segs"),
            ),
        ).otherwise(acc)

    empty_segs = F.array().cast("array<struct<s:bigint,e:bigint>>")
    segs = dpf.select(
        "n",
        "sp",
        F.aggregate(
            F.sequence(F.lit(1), F.col("n").cast("int")),
            F.struct(
                F.col("n").cast("long").alias("e"),
                empty_segs.alias("segs"),
            ),
            bt_step,
        )["segs"].alias("segs"),
    )
    out = segs.select(
        "sp", F.explode("segs").alias("g")
    ).select(
        (F.col("g.s") + 1).alias("start_idx"),
        F.col("g.e").alias("end_idx"),
        (F.col("g.e") - F.col("g.s")).alias("n_days"),
        (
            F.element_at("sp", (F.col("g.e") + 1).cast("int"))
            - F.element_at("sp", (F.col("g.s") + 1).cast("int"))
        ).cast("long").alias("seg_sum"),
    )
    return out.select(
        "start_idx",
        "end_idx",
        "n_days",
        "seg_sum",
        F.round(
            F.col("seg_sum").cast("double")
            / F.col("n_days").cast("double"),
            6,
        ).alias("seg_mean"),
    )


@register(
    "ts_rolling_corr",
    # Rolling 7-day Pearson correlation between daily click and
    # purchase counts (the co-movement monitor pair dashboards track):
    # every rolling moment (n, Sx, Sy, Sxx, Syy, Sxy) is an exact
    # BIGINT window sum over the trailing 7 rows of the calendar-
    # bounded daily frame, so each day's r is one sqrt+divide on
    # identical integer-valued doubles. Emitted only where the window
    # is full (6 preceding rows exist) and both variances are positive.
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    r AS (
      SELECT day,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
             CAST(sum(y * y) OVER w AS BIGINT) AS syy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS rolling_r
    FROM r
    WHERE n = 7 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def ts_rolling_corr(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("long")
        .alias("y"),
    )
    # calendar-bounded daily frame — the rolling window is tiny
    w = Window.orderBy("day").rowsBetween(-6, 0)
    r = d.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return r.filter(
        (F.col("n") == 7) & (vx > 0) & (vy > 0)
    ).select(
        "day",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            6,
        ).alias("rolling_r"),
    )
