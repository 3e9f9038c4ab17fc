from k2_18_spark.streaming.ingest import (  # noqa: F401
    stream_doc_features,
    stream_exact_dedup,
    stream_pages,
    windowed_doc_counts,
    write_stream,
)
from k2_18_spark.streaming.sessions import stream_sessionize  # noqa: F401
