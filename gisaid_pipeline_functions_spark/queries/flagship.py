"""Flagship query registration (SURVEY §7 step 1)."""

from __future__ import annotations

from ..plans.flagship import weekly_prevalence_top_n
from ..registry import register

_SQL = """
WITH base AS (
  SELECT CAST(ts AS DATE) - CAST(dayofweek(ts) AS INTEGER) AS week_start,
         event_type AS key
  FROM events
), freq AS (
  SELECT week_start, key, count(*) AS freq FROM base GROUP BY 1, 2
), pct AS (
  SELECT week_start, key, freq,
         CASE WHEN sum(freq) OVER (PARTITION BY week_start) = 0 THEN 0.0
              ELSE freq * 1.0 / sum(freq) OVER (PARTITION BY week_start)
         END AS pct
  FROM freq
), top AS (
  SELECT key, CAST(sum(freq) AS BIGINT) AS total_freq
  FROM freq GROUP BY key
  ORDER BY total_freq DESC, key ASC LIMIT 10
)
SELECT p.key AS event_type, p.week_start, p.freq,
       round(p.pct, 6) AS pct, t.total_freq
FROM pct p JOIN top t USING (key)
"""


@register("flagship_weekly_prevalence_topn", _SQL)
def flagship(spark, sf_dir):
    return weekly_prevalence_top_n(spark, sf_dir)
