"""Multimodal / semi-structured column queries: JSON props, array columns,
binary payload decode plumbing.

The decode oracle reconstructs the byte math in pure SQL (hex-pair sum
over the UTF-8 blob), so even the Pandas-UDF path is hash-checked — the
one place Python touches rows, and it still has an exact SQL twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_payment_data_lake_spark.operators import multimodal as M
from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.operators.spread import spread_narrow_scan


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n_events,
           min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    tags=("multimodal", "json"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string props -> typed field -> bucketed rollup (schema-on-read
    for semi-structured columns, the Glue DynamicFrame's actual use case
    done with from_json/get_json_object instead)."""
    (ev,) = load(spark, sf_dir, "events")
    # The JSON parse is the hot map-side work. Locally a single parquet
    # file arrives as 1-2 splits and would starve the cores, so spread it
    # — but GATE on input parallelism: at production scale the scan
    # already yields thousands of splits and a full-table shuffle "to
    # spread parsing" is pure waste (round-1 verdict).
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ev = spread_narrow_scan(ev, target=shuffle_n,
                            threshold=(shuffle_n + 1) // 2)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min(k).alias("min_k"),
             F.max(k).alias("max_k"),
             F.round(F.avg("value"), 6).alias("avg_value"))
        .orderBy("k_bucket")
    )


@register(
    "array_column_gallery",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(label AS INT) AS label,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                 (a, b) -> a + b), 6) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val
    FROM embeddings ORDER BY vec_id
    """,
    tags=("multimodal", "array"),
)
def array_column_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class array<float> column ops: size, fold (squared norm),
    element access, min/max — all higher-order functions, no explode."""
    (emb,) = load(spark, sf_dir, "embeddings")
    dbl = F.col("embedding").cast("array<double>")
    sq_norm = F.aggregate(
        F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, b: a + b)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("label").cast("int").alias("label"),
        F.round(sq_norm, 6).alias("sq_norm"),
        F.round(F.array_max(dbl), 6).alias("max_val"),
        F.round(F.array_min(dbl), 6).alias("min_val"),
        F.round(F.element_at(dbl, 1), 6).alias("first_val"),
    ).orderBy("vec_id")


@register(
    "multimodal_decode_stub",
    oracle="""
    WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    s AS (SELECT doc_id,
                 length(hx) // 2 AS n_bytes,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(regexp_extract_all(hx, '..'),
                                    p -> ('0x' || p)::BIGINT)),
                   (a, x) -> a + x) AS checksum
          FROM b)
    SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes, checksum,
           CAST(checksum % 640 + 1 AS INT) AS width,
           CAST(checksum // 640 % 480 + 1 AS INT) AS height
    FROM s ORDER BY doc_id
    """,
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched mapInPandas decode stub -> typed
    features, oracle-checked (byte checksum reconstructed from hex pairs
    in SQL)."""
    (docs,) = load(spark, sf_dir, "documents")
    return M.decode_payloads(M.with_binary_payload(docs)).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, regexp_extract_all(hex(encode(text)), '..') AS bytes
               FROM documents),
    f AS (SELECT doc_id, bytes, len(bytes) AS n, len(bytes) // 4 AS flen,
                 unnest(range(0, 4)) AS frame_idx
          FROM b)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(CASE WHEN frame_idx < 3 THEN flen ELSE n - 3 * flen END
                AS INT) AS frame_bytes,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_slice(bytes, frame_idx * flen + 1,
                            CASE WHEN frame_idx < 3
                                 THEN (frame_idx + 1) * flen ELSE n END),
                 p -> ('0x' || p)::BIGINT)),
             (a, x) -> a + x) AS frame_checksum
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "binary", "frame-sample", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: mapInPandas splits each blob
    into 4 even byte slices ("frames") and emits one row per frame with
    size + checksum — the real frame-extractor plumbing (schema, Arrow
    batches, explode-shaped output) with the codec stubbed
    deterministically; the oracle rebuilds the same slices from hex pairs
    in pure SQL."""
    (docs,) = load(spark, sf_dir, "documents")
    return (M.frame_sample(M.with_binary_payload(docs))
            .orderBy("doc_id", "frame_idx"))
