"""Structured Streaming surface.

The reference lists streaming ingestion (Kinesis/Kafka) only as a
"Potential Upgrade" (README.md:133) — here it is a first-class variant of
the same logical plans the batch engine runs:

  events.py         file-source event stream: watermarked tumbling /
                    session window aggregations, stateful stream dedup
                    (dropDuplicatesWithinWatermark).
  bronze_stream.py  streaming medallion ingest: raw CSV stream ->
                    bronze transforms -> partitioned parquet sink with
                    checkpointed exactly-once file commits.
  stateful.py       custom stateful operators: applyInPandasWithState
                    per-user running aggregates, plus the (env-gated)
                    transformWithStateInPandas twin.
  corpus.py         LLM-corpus tier on streams: document chunking
                    (stateless flatMap) and LM scoring under a
                    batch-trained LM (stream-static join).
  source.py         shared parquet stream-source plumbing (schema from
                    footer, literal-file->glob rule).

tests/test_streaming.py asserts stream==batch parity for each: the same
expressions produce the same rows whether fed a static DataFrame or a
file stream drained with Trigger.AvailableNow.
"""

from aws_payment_data_lake_spark.streaming.events import (  # noqa: F401
    deduped_event_stream,
    read_event_stream,
    run_available_now,
    start_available_now,
    tumbling_counts,
)
from aws_payment_data_lake_spark.streaming.bronze_stream import (  # noqa: F401
    read_raw_stream,
    run_bronze_stream,
    start_bronze_sink,
    start_bronze_upsert_sink,
)
from aws_payment_data_lake_spark.streaming.stateful import (  # noqa: F401
    user_running_totals,
)
from aws_payment_data_lake_spark.streaming.joins import (  # noqa: F401
    view_purchase_attribution_batch,
    view_purchase_attribution_stream,
)
from aws_payment_data_lake_spark.streaming.corpus import (  # noqa: F401
    chunk_stream,
    lm_score_stream,
    read_document_stream,
)
from aws_payment_data_lake_spark.streaming.source import (  # noqa: F401
    read_parquet_stream,
)
from aws_payment_data_lake_spark.streaming.rate_source import (  # noqa: F401
    rate_window_totals,
    rate_window_totals_batch,
    read_rate_events,
    synthetic_events,
)
