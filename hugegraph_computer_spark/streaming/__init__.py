from hugegraph_computer_spark.streaming.ingest import (
    stream_edges,
    incremental_wcc_batch,
    run_incremental_wcc,
)

__all__ = ["stream_edges", "incremental_wcc_batch", "run_incremental_wcc"]
