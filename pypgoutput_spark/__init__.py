"""pypgoutput_spark — a PySpark-native CDC / incremental-ingest engine.

From-scratch re-expression of the capabilities of dgea005/pypgoutput
(pgoutput logical-decoding CDC) as a distributed Spark pipeline:

    WAL frames (binary pgoutput messages, batched)
      → vectorized Arrow/pandas decode            (operators.decode)
      → LSN-ordered typed change events
      → last-write-wins dedup per (repo, path)    (operators.lww)
      → key-partitioned MERGE into a lake table   (operators.merge + lake.table)
    with schema evolution (plans.registry), exactly-once via
    checkpointed LSN watermarks (lake snapshots), and skew salting.

Plus the large-scale training-data operators (operators.dedup,
operators.similarity, operators.text, operators.multimodal).
"""

from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal.codec import decode_batch, decode_message

__version__ = "0.1.0"

__all__ = [
    "codec",
    "decode_message",
    "decode_batch",
    "LakeTable",
    "RelationRegistry",
    "decode_frames",
    "run_ingest",
    "__version__",
]


def __getattr__(name):  # lazy: keep pure-codec imports Spark-free
    if name == "LakeTable":
        from pypgoutput_spark.lake.table import LakeTable

        return LakeTable
    if name == "RelationRegistry":
        from pypgoutput_spark.plans.registry import RelationRegistry

        return RelationRegistry
    if name == "decode_frames":
        from pypgoutput_spark.operators.decode import decode_frames

        return decode_frames
    if name == "run_ingest":
        from pypgoutput_spark.streaming.pipeline import run_ingest

        return run_ingest
    raise AttributeError(name)
