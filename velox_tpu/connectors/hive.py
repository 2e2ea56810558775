"""Hive connector: file-based table scans and writes (Parquet).

Role parity: ``velox/connectors/hive`` (HiveDataSource splits/partitions,
HiveDataSink) + the dwio reader stack. Per SURVEY.md §7.4, file decoding on
the TPU is out of scope: pyarrow's Parquet reader plays the role of the
dwio readers, and this connector supplies the split model (one split = a
row-group range of one file, parity connectors/hive/HiveConnectorSplit),
column pruning, and device upload with trace-stable dictionaries.

String dictionaries: ordered comparisons run in dictionary-id space, which
requires one *sorted, table-stable* dictionary per column. The connector
builds them once per (file set, column) with a metadata/first-scan pass and
caches them — the analogue of the reference's per-file stride dictionaries,
hoisted to table scope so every split shares one compiled program.
"""

from __future__ import annotations

import glob as globmod
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from velox_tpu import types as T
from velox_tpu.connectors.connector import (
    Connector, ConnectorSplit, DataSink, DataSource, register_connector,
)
from velox_tpu.vector.device import (
    DeviceBatch, Dictionary, default_capacity, from_arrow,
)


@dataclass(frozen=True)
class HiveSplit(ConnectorSplit):
    """One row-group range of one file.
    Parity: connectors/hive/HiveConnectorSplit."""
    path: str = ""
    row_group_lo: int = 0
    row_group_hi: int = 0  # exclusive


class HiveTable:
    """A registered file-backed table (list of parquet files)."""

    def __init__(self, name: str, paths: List[str]):
        import pyarrow.parquet as pq
        self.name = name
        self.paths = sorted(paths)
        if not self.paths:
            raise ValueError(f"hive table {name!r}: no files")
        self.schema_arrow = pq.read_schema(self.paths[0])
        self.row_type = T.from_arrow_schema(self.schema_arrow) \
            if hasattr(T, "from_arrow_schema") else T.row(
                self.schema_arrow.names,
                [T.from_arrow(f.type) for f in self.schema_arrow])
        self._dictionaries: Optional[Dict[str, Dictionary]] = None
        self._max_row_group_rows: Optional[int] = None

    def dictionaries(self) -> Dict[str, Dictionary]:
        """Sorted table-stable dictionaries for all string columns."""
        if self._dictionaries is None:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
            out: Dict[str, Dictionary] = {}
            str_cols = [f.name for f in self.schema_arrow
                        if T.from_arrow(f.type).is_string]
            if str_cols:
                uniq = {c: set() for c in str_cols}
                for p in self.paths:
                    t = pq.read_table(p, columns=str_cols)
                    for c in str_cols:
                        col = t.column(c)
                        vals = pc.unique(col.combine_chunks()).to_pylist()
                        uniq[c].update(v for v in vals if v is not None)
                for c in str_cols:
                    out[c] = Dictionary(sorted(uniq[c]))
            self._dictionaries = out
        return self._dictionaries

    def max_row_group_rows(self) -> int:
        if self._max_row_group_rows is None:
            import pyarrow.parquet as pq
            m = 1
            for p in self.paths:
                md = pq.ParquetFile(p).metadata
                for i in range(md.num_row_groups):
                    m = max(m, md.row_group(i).num_rows)
            self._max_row_group_rows = m
        return self._max_row_group_rows

    def splits(self) -> List[HiveSplit]:
        import pyarrow.parquet as pq
        out = []
        for p in self.paths:
            n = pq.ParquetFile(p).metadata.num_row_groups
            for i in range(n):
                out.append(HiveSplit("hive", p, i, i + 1))
        return out


class HiveDataSource(DataSource):
    """Parity: connectors/hive/HiveDataSource.cpp:205 (split readers with
    column pruning; batches padded to one table-wide capacity)."""

    def __init__(self, table: HiveTable, columns: Sequence[str],
                 capacity: Optional[int] = None):
        self._table = table
        self._columns = list(columns)
        self._capacity = capacity or default_capacity(
            table.max_row_group_rows())
        self._done: set = set()

    def dictionaries(self) -> Dict[str, Dictionary]:
        d = self._table.dictionaries()
        return {c: d[c] for c in self._columns if c in d}

    def next(self, split: HiveSplit) -> Optional[DeviceBatch]:
        import pyarrow.parquet as pq
        key = (split.path, split.row_group_lo)
        if key in self._done:
            return None
        self._done.add(key)
        from velox_tpu.connectors.cache import DataCache
        mtime = os.path.getmtime(split.path)  # invalidate on rewrite
        ckey = ("hive", split.path, mtime, split.row_group_lo,
                split.row_group_hi, tuple(self._columns), self._capacity)
        cached = DataCache.instance().get(ckey)
        if cached is not None:
            return cached
        pf = pq.ParquetFile(split.path)
        t = pf.read_row_groups(
            list(range(split.row_group_lo, split.row_group_hi)),
            columns=self._columns)
        batch = from_arrow(t, capacity=self._capacity,
                           dictionaries=self.dictionaries())
        DataCache.instance().put(ckey, batch)
        return batch


class HiveDataSink(DataSink):
    """Writes device batches to a parquet file.
    Parity: connectors/hive/HiveDataSink.h:427 (appendData/close)."""

    def __init__(self, path: str):
        self.path = path
        self._tables = []
        self.rows_written = 0
        self.bytes_written = 0

    def append(self, batch: DeviceBatch) -> None:
        from velox_tpu.vector.device import to_arrow
        t = to_arrow(batch)
        self._tables.append(t)
        self.rows_written += t.num_rows

    def close(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        if not self._tables:
            return
        table = pa.concat_tables(self._tables)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        pq.write_table(table, self.path)
        self.bytes_written = os.path.getsize(self.path)
        self._tables = []


class HiveConnector(Connector):
    """Parity: connectors/hive/HiveConnector.h."""

    def __init__(self, connector_id: str = "hive"):
        super().__init__(connector_id)
        self._tables: Dict[str, HiveTable] = {}

    def register_table(self, name: str, path_or_glob: str) -> HiveTable:
        if os.path.isdir(path_or_glob):
            paths = globmod.glob(os.path.join(path_or_glob, "*.parquet"))
        else:
            paths = globmod.glob(path_or_glob) or [path_or_glob]
        t = HiveTable(name, paths)
        self._tables[name] = t
        return t

    def table_schema(self, table: str) -> T.DataType:
        return self._tables[table].row_type

    def create_data_source(self, table: str, columns, ctx) -> HiveDataSource:
        cap = ctx.get("hive.batch_capacity") if ctx is not None else None
        return HiveDataSource(self._tables[table], columns, cap)

    def create_data_sink(self, path: str) -> HiveDataSink:
        return HiveDataSink(path)

    def default_splits(self, table: str, ctx=None) -> List[HiveSplit]:
        return self._tables[table].splits()


def register_hive(connector_id: str = "hive") -> HiveConnector:
    conn = HiveConnector(connector_id)
    register_connector(conn)
    return conn
