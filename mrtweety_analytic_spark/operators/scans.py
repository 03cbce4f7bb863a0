"""Scans and schema-on-read sources (§2B: q_scan_*, q_source_*).

These verify the Catalyst scan path: column pruning and predicate
pushdown must reach the parquet reader (`PushedFilters`/`ReadSchema`
in .explain), which is what makes a 100 TB scan read only the bytes
the query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table, table_path


@register(
    "q_scan_parquet",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan count — planned as a metadata-only parquet row-count
    (no column materialization at all).
    """
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "q_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter, both pushed into the scan: ReadSchema is
    3 of 11 columns and PushedFilters carries the range predicate
    (row-group min/max skipping at scale).
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "q_source_json_lines",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
    FROM events
    """,
)
def q_source_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a JSON-string column with an explicit
    StructType — the declarative form of the reference's imperative
    org.json navigation (SparkApplication.scala:66-85); malformed
    JSON yields NULL (≙ optJSONObject tolerance at :68).
    """
    events = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return events.select(
        "event_id", F.from_json(F.col("props"), schema).getField("k").alias("k")
    )


@register(
    "q_sample_hash_mod",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 10 = 3
    """,
)
def q_sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key modulus. Unlike
    TABLESAMPLE/df.sample (RNG per task attempt — not reproducible
    across retries or engines), a key-modulus predicate is a pure
    filter: reproducible, pushdown-eligible, and stable under
    partition reshuffles — the only sampling that is safe to cite in
    a data-lineage audit of a 100 TB corpus.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table materialized Hive-partitioned by event_type,
    cached across calls (key includes source size+mtime so a
    regenerated corpus never reuses a stale copy). Shared by the
    static (q_scan_partition_pruned) and dynamic (q_join_dpp)
    pruning certificates."""
    import os
    import tempfile

    events = load_table(spark, sf_dir, "events")
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    out = os.path.join(
        tempfile.gettempdir(),
        f"mrtweety_part_events_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{st.st_size}_{int(st.st_mtime)}_{os.getuid()}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    # explicit schema: an empty source writes zero partition dirs and
    # schema inference would fail; declared-on-read is also the
    # production posture (audit_empty robustness)
    return spark.read.schema(events.schema).parquet(out)


@register(
    "q_scan_partition_pruned",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    """,
)
def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan, certified end-to-end: materialize the
    events table Hive-partitioned by event_type (the write any 100 TB
    event lake does), then answer a two-type query — the scan touches
    only the two selected partition directories (static pruning; the
    dynamic variant is certified by q_join_dpp and
    test_dynamic_partition_pruning).
    The oracle states the same semantics over the unpartitioned table,
    so the partitioned layout is proven value-preserving too.
    """
    part = partitioned_events(spark, sf_dir)
    return (
        part.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy(F.col("event_type").cast("string").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )


@register(
    "q_source_custom_pyds",
    oracle="""
    WITH ids AS (SELECT unnest(generate_series(0, 999)) AS i),
    ks AS (SELECT unnest(generate_series(0, 2)) AS k),
    tags AS (
        SELECT lower((['spark','Spark','SPARK','python','data',
                       'streaming','europe','kafka','scale','parquet']
                     )[((i * 7 + k * 3) % 10) + 1]) AS hashtag
        FROM ids JOIN ks ON k < i % 4
    )
    SELECT hashtag, count(*) AS n
    FROM tags
    WHERE hashtag NOT IN ('europe', 'europa', 'eu', 'euro')
    GROUP BY hashtag
    """,
)
def q_source_custom_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector (Python Data Source API) driven through the
    reference's R3+R4 parse path: the deterministic tweetgen source
    emits partition-parallel tweet JSON, from_json+explode extracts
    hashtags, the blacklist drops the reference's tracked terms, and
    the case-folded count is checked against a pure-SQL re-derivation
    of the generator — certifying source partitioning, JSON parsing,
    null-entity tolerance, and filter semantics in one query.
    """
    from ..sources_python_ds import register_tweetgen
    from ..streaming.pipeline import blacklist_filter, parse_hashtags

    register_tweetgen(spark)
    raw = (
        spark.read.format("tweetgen")
        .option("rows", "1000")
        .option("partitions", "8")
        .load()
    )
    tags = blacklist_filter(parse_hashtags(raw))
    return tags.groupBy(F.lower("hashtag").alias("hashtag")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_source_binaryfile",
    oracle="""
    SELECT count(*) AS n_files,
           -- strlen = BYTE length in DuckDB: the files are written
           -- UTF-8-encoded, so compare bytes-vs-bytes (length() would
           -- count characters and drift on non-ASCII corpora).
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text)) AS n_distinct
    FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 20)
    """,
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — Spark's native opaque-blob ingest
    (one row per file: path, modificationTime, length, content) and
    the front door for image/audio/video payloads at 100 TB (pair
    with pathGlobFilter + recursiveFileLookup over an object-store
    prefix; downstream decode is the multimodal mapInPandas tier).
    Certified end-to-end: 20 deterministic payload files are written
    out, read back through binaryFile, and the (count, bytes,
    distinct-digest) profile must equal the same profile computed
    relationally from the source table.
    """
    import os

    from .sinks import _scratch

    docs = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(20)
        .select("doc_id", "text")
        .collect()
    )
    # Succession-cleaned scratch slot (two generations retained,
    # atexit removal) — same lifecycle as the sink roundtrips.
    out = _scratch("binfiles", sf_dir)
    os.makedirs(out)
    for r in docs:
        with open(os.path.join(out, f"doc_{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    files = spark.read.format("binaryFile").load(out)
    return files.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("length").alias("total_bytes"),
        F.countDistinct(F.md5("content")).alias("n_distinct"),
    )


@register(
    "q_scan_file_metadata",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           count(*) AS n_rows,
           count(DISTINCT event_id) AS n_ids
    FROM events
    """,
)
def q_scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `_metadata` hidden column on file scans: every row carries
    its source file (name, path, size, mod time) with no extra I/O —
    row-level lineage. At 100 TB this is the quarantine primitive:
    when a corrupt producer file poisons a snapshot, grouping by
    `_metadata.file_name` identifies and excises exactly the affected
    rows without re-reading the lake. Certified by profiling the
    events table per source file against the relational row count.
    """
    df = spark.read.parquet(table_path(sf_dir, "events")).select(
        F.col("_metadata.file_name").alias("file_name"), "event_id"
    )
    return df.groupBy("file_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "q_join_dpp",
    oracle="""
    WITH dim AS (
        SELECT event_type FROM events
        GROUP BY event_type HAVING avg(value) > 25
    )
    SELECT e.event_type, count(*) AS n, round(sum(e.value), 4) AS total
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, certified end-to-end: the
    Hive-partitioned fact is joined to a dim whose qualifying keys
    are only known at RUNTIME (event types with avg value > 25), so
    no static filter exists for the planner to push — Catalyst
    instead plants a dynamicpruning subquery in the fact's partition
    filters and the scan reads only the dim-selected directories
    once the build side materializes. At 100 TB this is the
    difference between reading the selected event_type directories
    and the whole lake whenever the selective predicate lives on the
    dimension. Value parity is oracle-certified; the
    dynamicpruningexpression plan shape is pinned by
    tests/test_operators.py::test_join_dpp_plan_has_dynamic_pruning.
    """
    part = partitioned_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("av"))
        .filter(F.col("av") > 25)
        .select("event_type")
    )
    return (
        part.join(dim, "event_type")
        .groupBy(F.col("event_type").cast("string").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )


@register(
    "q_sample_time_split",
    oracle="""
    WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
               FROM events),
    cut AS (SELECT mn + CAST(floor(0.8 * (mx - mn)) AS BIGINT) AS t1
            FROM b),
    lab AS (
        SELECT e.user_id, e.ts,
               CASE WHEN epoch_us(e.ts) < c.t1 THEN 'train'
                    WHEN epoch_us(e.ts) >= c.t1 + 86400000000
                        THEN 'test'
                    ELSE 'embargo' END AS split
        FROM events e CROSS JOIN cut c
    )
    SELECT split, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(ts) AS min_ts, max(ts) AS max_ts
    FROM lab GROUP BY split
    """,
)
def q_sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split with a 1-day EMBARGO gap — the
    backtesting contract for temporal models: train ends at the 80%
    point of the event timeline, test starts a full day later, and
    everything between is quarantined so trailing-window features
    computed at train time (e.g. q_events_feature_window's 7-day
    sums) cannot straddle the boundary and leak test-period signal.
    Complements q_split_leakage_safe (which guards CONTENT leakage
    via near-dup clusters) on the temporal axis.

    Scale: the timeline bounds are one tiny aggregate broadcast back
    onto a stateless per-row CASE — the split is a map-only pass that
    composes with partition pruning (a date-partitioned 100 TB layout
    prunes each split to its partition range). Integer-microsecond
    cutoff arithmetic, one double multiply, floor — engine-exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    b = ev.agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    ).select(
        (
            F.col("mn")
            + F.floor(0.8 * (F.col("mx") - F.col("mn"))).cast("bigint")
        ).alias("t1")
    )
    lab = ev.crossJoin(F.broadcast(b)).select(
        "user_id",
        "ts",
        F.when(F.col("us") < F.col("t1"), "train")
        .when(F.col("us") >= F.col("t1") + 86400000000, "test")
        .otherwise("embargo")
        .alias("split"),
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
