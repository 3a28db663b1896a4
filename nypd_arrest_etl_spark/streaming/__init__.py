from nypd_arrest_etl_spark.streaming.pipeline import (
    sessionized_stream,
    stream_etl,
    tumbling_counts_stream,
)

__all__ = ["stream_etl", "tumbling_counts_stream", "sessionized_stream"]
