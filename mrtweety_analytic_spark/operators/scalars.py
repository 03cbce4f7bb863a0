"""Scalar function surface (§2B: q_fn_*). All JVM-side builtins —
whole-stage-codegen'd, no Python in the row loop.

Oracle type notes: DuckDB year()/datediff() return BIGINT and floor()
DECIMAL — the oracle SQL casts them to match Spark's INT/BIGINT so the
driver's schema comparison agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS INTEGER) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           replace(p_type, ' ', '_') AS type_slug
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS INTEGER) AS days_to_end
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias(
            "days_to_end"
        ),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc_gap,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(ln(l_extendedprice + 1), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_gap"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(arr).alias("n_tokens"),
        F.array_contains(arr, "spark").alias("has_spark"),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_value
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string -> MapType -> key lookup (≙ the reference's
    imperative field access, SparkApplication.scala:68-74)."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.IntegerType()))
    return events.select(
        "event_id", F.element_at(m, "k").alias("k_value")
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id, props->>'$.k' AS k_str
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_str")
    )


@register(
    "q_fn_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS bucket
    FROM orders
    """,
)
def q_fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_partkey,
           l_orderkey & 255 AS band,
           l_orderkey | 4096 AS bor,
           xor(l_orderkey, l_partkey) AS bxor,
           l_linenumber << 4 AS shl,
           l_partkey >> 2 AS shr
    FROM lineitem
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shifts — the primitive layer under hash
    partitioning, bloom filters, and simhash banding. All JVM-side
    codegen; no UDF.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.expr("l_orderkey & 255").alias("band"),
        F.expr("l_orderkey | 4096").alias("bor"),
        F.expr("l_orderkey ^ l_partkey").alias("bxor"),
        F.shiftleft(F.col("l_linenumber"), 4).alias("shl"),
        F.shiftright(F.col("l_partkey"), 2).alias("shr"),
    )


@register(
    "q_fn_interval",
    date_as_ts=True,
    oracle="""
    SELECT event_id,
           ts + INTERVAL 1 DAY AS next_day,
           ts - INTERVAL 90 MINUTE AS back90,
           CAST(ts AS DATE) AS d,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start
    FROM events
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp ± INTERVAL arithmetic and day/hour truncation —
    exact µs integer math in both engines once the session is UTC.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("ts + INTERVAL 1 DAY").alias("next_day"),
        F.expr("ts - INTERVAL 90 MINUTE").alias("back90"),
        F.col("ts").cast("date").alias("d"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
    )


@register(
    "q_fn_array_lambda",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
               AS n_pos,
           round(list_aggregate(list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * x),
                                'sum'), 4) AS sq_norm,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4)
               AS max_dim
    FROM embeddings
    """,
)
def q_fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter/transform/aggregate
    lambdas) — JVM-side codegen over the array column, the no-UDF way
    to compute per-vector statistics at scale.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_dim"),
    )


@register(
    "q_fn_regex_extract_all",
    # Raw string: in a plain literal '\b' is a BACKSPACE (0x08), and
    # DuckDB would silently match nothing — the gate only catches it
    # when the corpus contains a 12+ letter word.
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]*tion')) AS INTEGER)
               AS n_tion,
           coalesce(array_to_string(
               regexp_extract_all(text, '\b[a-z]{12,}\b'), ','), '')
               AS long_words
    FROM documents
    """,
)
def q_fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: all matches per row as an array — the
    vectorized JVM-side alternative to a Python re UDF for pattern
    mining over a text corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]*tion"), 0)).alias(
            "n_tion"
        ),
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\b[a-z]{12,}\b"), 0), ","
        ).alias("long_words"),
    )


@register(
    "q_fn_hash_digest",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def q_fn_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content digests (md5 / sha-256), JVM-side and
    codegen'd — the content-addressable key primitive behind exact
    dedup and cache-keying of 100 TB corpora. Embarrassingly
    parallel: no shuffle, digests computed in the scan stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


@register(
    "q_fn_variant",
    oracle="""
    SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_mod,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json once into
    the binary variant encoding, then typed path extraction — unlike
    per-field get_json_object calls, the document parses once however
    many fields are read, and the open schema survives schema drift
    (the 100 TB answer to evolving event payloads).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.parse_json("props").alias("v"))
        .select(
            (F.try_variant_get("v", "$.k", "int") % 10).alias("k_mod")
        )
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_fn_base64",
    oracle="""
    SELECT doc_id,
           to_base64(CAST(substring(text, 1, 12) AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(substring(text, 1, 12) AS BLOB)))
                AS VARCHAR) = substring(text, 1, 12) AS roundtrip_ok
    FROM documents
    """,
)
def q_fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary↔text codec surface (base64/unbase64) with an in-query
    roundtrip proof — the interchange primitive for shipping binary
    payloads (multimodal columns) through text-only transports.
    """
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 12)
    b64 = F.base64(prefix.cast("binary"))
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        (F.unbase64(b64).cast("string") == prefix).alias("roundtrip_ok"),
    )


@register(
    "q_fn_url_parse",
    oracle="""
    WITH u AS (SELECT doc_id,
                      'https://' || source || '.example.com/docs/'
                          || doc_id || '?lang=' || lang AS url
               FROM documents)
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?lang=([a-z]+)', 1) AS lang_param
    FROM u
    """,
)
def q_fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the builtin parse_url (host / path /
    query parameter) — the log-enrichment primitive. The oracle
    re-derives the same parts with regexes from the identical
    synthesized URL, so the check certifies parse_url's component
    semantics, not just string plumbing. Row-local, codegen'd, no
    shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
    )


@register(
    "q_fn_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(props->>'$.k' AS INTEGER) AS k_int,
           TRY_CAST(substring(event_type, 1, 2) AS INTEGER) AS bad_int
    FROM events
    """,
)
def q_fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (try_cast): malformed input yields NULL
    instead of failing the job — the difference between one poison
    record and a dead 100 TB pipeline. Restricted to integer-string
    and non-numeric cases where Spark and DuckDB agree (they diverge
    on decimal-string → INT: DuckDB rounds, Spark nulls — documented
    boundary, not exercised).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id",
        "try_cast(get_json_object(props, '$.k') AS INT) AS k_int",
        "try_cast(substring(event_type, 1, 2) AS INT) AS bad_int",
    )


@register(
    "q_fn_date_arith",
    oracle="""
    SELECT event_id,
           CAST(ts + INTERVAL 3 DAY AS TIMESTAMP) AS plus3d,
           CAST(last_day(ts) AS TIMESTAMP) AS month_end,
           CAST(weekofyear(ts) AS INTEGER) AS iso_week,
           CAST(isodow(ts) AS INTEGER) AS iso_dow
    FROM events
    """,
)
def q_fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime arithmetic breadth: interval shift, month-end
    rollover, ISO week + ISO weekday — the calendar primitives
    partition layouts and retention windows are built from. ISO
    variants chosen deliberately: both engines agree on ISO-8601
    week/weekday numbering, while 'week of year' under locale rules
    would not hash-match.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        F.last_day("ts").cast("timestamp").alias("month_end"),
        F.weekofyear("ts").alias("iso_week"),
        # dayofweek() is Sunday=1; ISO wants Monday=1
        F.expr("(dayofweek(ts) + 5) % 7 + 1").alias("iso_dow"),
    )


@register(
    "q_fn_struct",
    oracle="""
    WITH s AS (
        SELECT o_orderkey,
               {'status': o_orderstatus,
                'cust': o_custkey} AS os,
               {'status': 'O', 'cust': o_custkey} AS probe
        FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey,
           os.status AS status_field,
           os.cust AS cust_field,
           os = probe AS struct_eq,
           to_json(os) AS as_json
    FROM s
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT scalar surface: build a named struct, read fields
    back, compare whole structs for equality, and serialize to JSON
    — the nested-type round trip every semi-structured pipeline
    leans on (q_fn_map and q_fn_json cover the other two nested
    kinds). Field types are int/string only so the JSON rendering
    is byte-identical across engines (doubles would format
    differently). Results flatten to atomic columns per the schema
    contract; pure map pass, no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    os_ = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("cust"),
    )
    probe = F.struct(
        F.lit("O").alias("status"), F.col("o_custkey").alias("cust")
    )
    return orders.select(
        "o_orderkey",
        os_.getField("status").alias("status_field"),
        os_.getField("cust").alias("cust_field"),
        (os_ == probe).alias("struct_eq"),
        F.to_json(os_).alias("as_json"),
    )


@register(
    "q_fn_try_arith",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice / nullif(p_size - 5, 0), 6)
               AS price_per_adj_size,
           TRY_CAST(substr(p_brand, 7, 2) AS INTEGER) AS brand_num,
           TRY_CAST(p_name AS INTEGER) AS name_as_int,
           CASE WHEN p_size - 5 = 0 THEN 'div0' ELSE 'ok' END
               AS div_status
    FROM part
    """,
)
def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface — Spark 4 runs with ANSI mode ON,
    where division by zero and malformed casts RAISE instead of
    silently returning NULL (the pre-ANSI behavior that hid data
    bugs). Pipelines that prefer null-propagation over job failure
    use the `try_*` family: try_divide yields NULL on a zero
    denominator (p_size = 5 rows here — real mixed data, not a
    synthetic all-null column), try_cast yields NULL on unparseable
    input (part names never parse, brand suffixes always do). The
    DuckDB oracle expresses the same semantics with nullif and
    TRY_CAST, certifying the null-propagation contract cross-engine.
    This op is why the empty-corpus/restart audits can hold 'nothing
    may raise': the try_* tier is the sanctioned way to keep a
    100 TB job alive through dirty rows while preserving ANSI
    strictness everywhere else.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(
            F.try_divide(F.col("p_retailprice"), F.col("p_size") - 5),
            6,
        ).alias("price_per_adj_size"),
        F.substring(F.col("p_brand"), 7, 2)
        .try_cast("int")
        .alias("brand_num"),
        F.col("p_name").try_cast("int").alias("name_as_int"),
        F.when(F.col("p_size") - 5 == 0, "div0")
        .otherwise("ok")
        .alias("div_status"),
    )
