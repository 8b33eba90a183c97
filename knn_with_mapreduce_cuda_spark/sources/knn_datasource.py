"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) for
the reference's native train-file format: one sample per line,
``label,f1,f2,…,fd`` (SURVEY.md §1.1 [P:Anchalia14]).

Where ``readers.read_knn_text`` parses the format with DataFrame string
expressions, this is the *engine-integrated* version: a first-class
``spark.read.format("knn_text")`` source with

- **one input partition per file** — Spark schedules each file to an
  executor, so a directory of N shards reads with N-way parallelism
  (the 100 TB path: shard count = parallelism, no driver bottleneck);
- **filter pushdown** (``pushFilters``): an ``EqualTo("label", v)``
  predicate is evaluated inside the source during the scan, so
  non-matching lines never cross the Python→JVM Arrow boundary.

Stable row ids without coordination: ``vec_id = file_index * ROWS_PER_FILE
+ line_number`` — derivable per partition, no monotonically_increasing_id
(whose values depend on partition layout).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ROWS_PER_FILE = 10_000_000


class _KnnFilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


class KnnTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.dim = int(options.get("dim", "64"))
        self.label_eq: int | None = None

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("label",):
                self.label_eq = int(f.value)
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                p
                for p in glob.glob(os.path.join(self.path, "*"))
                if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [_KnnFilePartition(i, p) for i, p in enumerate(files)]

    def read(self, partition: _KnnFilePartition):
        base = partition.index * ROWS_PER_FILE
        with open(partition.path, "r", encoding="utf-8") as fh:
            for lineno, line in enumerate(fh):
                line = line.strip()
                if not line:
                    continue
                parts = line.split(",")
                label = int(parts[0])
                if self.label_eq is not None and label != self.label_eq:
                    continue
                feats = [float(x) for x in parts[1 : self.dim + 1]]
                yield (base + lineno, label, feats)


class KnnTextDataSource(DataSource):
    """``spark.read.format("knn_text").option("dim", 64).load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "knn_text"

    def schema(self) -> str:
        return "vec_id bigint, label int, emb array<double>"

    def reader(self, schema) -> KnnTextReader:
        return KnnTextReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch stream source: each batch emits the next
    ``batch_size`` synthetic events (monotone event_id, Knuth-hash value).
    Offsets are plain row counters, so ``readBetweenOffsets`` can replay
    any committed range exactly — the property exactly-once sinks need
    from a replayable source (the Kafka-offset model in miniature)."""

    def __init__(self, options):
        self.batch_size = int(options.get("batchsize", "10"))

    def _rows(self, start: int, end: int):
        # a concrete list: Spark pickles the prefetched batch for replay
        return [
            (i, (i * 2654435761) % 1000003, float(i % 100)) for i in range(start, end)
        ]

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = i + self.batch_size
        return self._rows(i, end), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))


class SyntheticEventsDataSource(DataSource):
    """``spark.readStream.format("synthetic_events").load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, h bigint, value double"

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    # runtime-settable; required or Spark refuses a reader that
    # implements pushFilters()
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KnnTextDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
