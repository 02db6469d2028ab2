from linkedin_iceberg_spark.streaming.sink import (  # noqa: F401
    append_batch_idempotent,
    foreach_batch_writer,
)
from linkedin_iceberg_spark.streaming.source import (  # noqa: F401
    micro_batches,
    register_stream_source,
)
