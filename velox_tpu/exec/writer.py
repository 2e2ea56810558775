"""TableWriter operator.

Role parity: ``velox/exec/TableWriter.h:100`` — drains input into a
connector DataSink and emits one summary row (rows/bytes written, file
path), like the reference's fragment-stats output.
"""

from __future__ import annotations

from typing import Optional

from velox_tpu import types as T
from velox_tpu.core import plan as P
from velox_tpu.exec.operator import Operator
from velox_tpu.vector.device import DeviceBatch


class TableWriterOperator(Operator):
    def __init__(self, node: "P.TableWriteNode"):
        super().__init__(node)
        self._node = node
        from velox_tpu.connectors.connector import get_connector
        conn = get_connector(node.connector_id)
        kw = {}
        if getattr(node, "file_format", None):
            kw["file_format"] = node.file_format
        if node.partition_keys or node.bucket_count:
            self._sink = conn.create_data_sink(
                node.target_path, partition_keys=node.partition_keys,
                bucket_count=node.bucket_count,
                bucket_keys=node.bucket_keys, **kw)
        else:
            self._sink = conn.create_data_sink(node.target_path, **kw)
        self._out: Optional[DeviceBatch] = None

    def add_input(self, batch):
        self._sink.append(batch)

    def no_more_input(self):
        super().no_more_input()
        self._sink.close()
        import pyarrow as pa
        from velox_tpu.vector.device import from_arrow
        summary = pa.table({
            "rows": pa.array([self._sink.rows_written], pa.int64()),
            "bytes": pa.array([self._sink.bytes_written], pa.int64()),
            "path": pa.array([self._node.target_path], pa.string()),
        })
        self._out = from_arrow(summary)

    def get_output(self):
        out, self._out = self._out, None
        return out

    def is_finished(self):
        return self._no_more_input and self._out is None
