"""Python UDTF surface (SURVEY.md §2B UDTF note — the optional
stretch): a table function expanding each JSON props object into
(key, value) rows, joined laterally to its source row.

UDTFs are the user-extensible row-generator API (one input row → n
output rows) — the explode() escape hatch for logic explode can't
express. Arrow-batched like pandas UDFs; keep real work JVM-side and
reserve UDTFs for genuinely procedural expansion.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import register
from ..sources import load_table


@udtf(returnType="key string, val int")
class ExpandProps:
    """One (json_str) input row -> one row per JSON object entry."""

    def eval(self, props: str):  # noqa: D102
        if props is None:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if isinstance(obj, dict):
            for k in sorted(obj):
                v = obj[k]
                yield k, int(v) if isinstance(v, (int, float)) else None


@register(
    "q_udtf_expand_json",
    oracle="""
    SELECT event_id, k AS key,
           CAST(json_extract_string(props, '$.' || k) AS INTEGER) AS val
    FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
          FROM events)
    ORDER BY event_id, key
    """,
)
def q_udtf_expand_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the UDTF against the events table: each row's
    props object becomes (event_id, key, val) rows."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("v_events_udtf")
    spark.udtf.register("expand_props", ExpandProps)
    return spark.sql(
        """
        SELECT event_id, p.key, p.val
        FROM v_events_udtf,
        LATERAL expand_props(props) AS p
        ORDER BY event_id, key
        """
    )
