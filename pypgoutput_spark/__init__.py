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

__all__ = ["codec", "decode_message", "decode_batch", "__version__"]
