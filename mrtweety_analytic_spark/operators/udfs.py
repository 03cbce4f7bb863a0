"""UDF surface (§2B: q_udf_scalar, q_udaf_grouped).

Demonstrates the sanctioned slow paths: Arrow-vectorized pandas UDF
for scalar logic and applyInPandas for grouped custom aggregation.
Both mirror pure-SQL oracles, proving the Python path preserves
semantics (float64 end-to-end, rounded on the same grid).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table


@F.pandas_udf(T.DoubleType())
def _revenue_udf(price: pd.Series, discount: pd.Series) -> pd.Series:
    # float64 arithmetic: bit-identical to the JVM expression.
    return price * (1.0 - discount)


@register(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue_udf
    FROM lineitem
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            _revenue_udf(F.col("l_extendedprice"), F.col("l_discount")), 4
        ).alias("revenue_udf"),
    )


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE)
                                     * 100 + 0.5) AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / sum(l_quantity) / 100, 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregate via applyInPandas: quantity-weighted
    mean price per return flag (one pandas frame per group).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        # Integer-cent accumulation: the float dot-product sum is
        # row-order-dependent (pandas frames arrive in shuffle order)
        # while int64 sums are exact under any order — the same
        # discipline as q_agg_multi, inside the Arrow kernel.
        import numpy as np

        cents = np.floor(
            pdf["l_extendedprice"].to_numpy() * 100 + 0.5
        ).astype(np.int64)
        qty = pdf["l_quantity"].to_numpy().astype(np.int64)
        num_cents = int((cents * qty).sum())
        den = int(qty.sum())
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "wavg_price": [round(num_cents / den / 100, 4)],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        wavg, schema="l_returnflag string, wavg_price double"
    )


@register(
    "q_udf_arrow",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy Arrow-native batch path — record
    batches flow from Tungsten to pyarrow without the pandas
    conversion layer (no object boxing, no index materialization),
    which is the cheapest possible Python crossing for numeric array
    work. Computes per-vector L2 norm over the embedding column with
    numpy on the Arrow buffers; float64 end-to-end so the rounded
    values sit on the same grid as the SQL oracle.
    """
    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )

    def norms(batches):
        import numpy as np

        for batch in batches:
            col = batch.column("e")
            flat = np.asarray(col.flatten(), dtype=np.float64)
            # A sliced ListArray keeps raw offsets (not 0-based) while
            # flatten() trims to the slice — rebase before reduceat.
            offsets = np.asarray(col.offsets, dtype=np.int64)
            offsets = offsets - offsets[0]
            if flat.size:
                # Sentinel-pad the value buffer: a trailing empty/null
                # list makes offsets[:-1] end at len(flat), which is a
                # legal reduceat start only if that index exists. The
                # lengths>0 mask below zeroes whatever the pad produces.
                sq = np.add.reduceat(
                    np.append(flat * flat, 0.0), offsets[:-1]
                )
            else:
                # Empty value buffer (a batch of only empty/null
                # lists); every row's sum is 0.
                sq = np.zeros(len(col), dtype=np.float64)
            # reduceat on a zero-length slice returns the NEXT
            # element; mask those rows to 0.
            lengths = np.diff(offsets)
            sq = np.where(lengths > 0, sq, 0.0)
            norm = np.round(np.sqrt(sq), 6)
            # NULL embedding → NULL norm (matching SQL semantics, not
            # 0.0): carry the list-level validity through.
            mask = col.is_null().to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [batch.column("vec_id"),
                 pa.array(norm, pa.float64(), mask=mask)],
                names=["vec_id", "l2_norm"],
            )

    return emb.mapInArrow(norms, schema="vec_id long, l2_norm double")
