"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests bespoke inputs through ad-hoc readers (carbon CSVs at
`low-carbon-scheduling/src/carbon.py:4-46`, values CSVs at
`workload.py:29-52`); Spark 4's Python DataSource API is the engine-native
way to wrap such feeds as first-class tables: the source declares its
schema and PARTITIONS, executors pull each partition independently (no
driver-side materialization), and the result composes with the full
DataFrame surface.

``CarbonGridDataSource`` here is a deterministic synthetic carbon-intensity
grid — the same shape as the reference's upsampled series — exposed as
``spark.read.format("carbon_grid")``. Options:

* ``slots``  — number of 1-second slots (default 3600)
* ``base``   — base intensity in g/kWh (default 100)
* ``parts``  — read partitions (default 8)

Each partition generates its own slot range from the option values alone
(pure function of slot index — no shared state, no driver bottleneck), so
the source scales to a billion-slot year exactly like a parquet scan:
|parts| independent tasks. Values are exact integers, so reads are
bit-deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("slot", LongType(), False),
        StructField("intensity", IntegerType(), False),
    ]
)


def _intensity(slot: int, base: int) -> int:
    """Deterministic pseudo-seasonal intensity: base + a triangle wave over
    the day + a small slot-hash jitter. Integer-only — no float drift."""
    day_pos = slot % 86_400
    tri = abs(day_pos - 43_200) // 600  # 0..72 triangle across the day
    jitter = (slot * 2_654_435_761) % 7  # Weyl hash, 0..6
    return base + tri + jitter


class _SlotRange(InputPartition):
    def __init__(self, start: int, end: int, base: int):
        self.start = start
        self.end = end
        self.base = base


class _CarbonGridReader(DataSourceReader):
    def __init__(self, options):
        self.slots = max(0, int(options.get("slots", 3600)))
        self.base = int(options.get("base", 100))
        self.parts = max(1, int(options.get("parts", 8)))

    def partitions(self):
        if self.slots == 0:
            # An empty grid is a valid (empty) table, not a planning error.
            return [_SlotRange(0, 0, self.base)]
        step = -(-self.slots // self.parts)  # ceil division
        return [
            _SlotRange(lo, min(lo + step, self.slots), self.base)
            for lo in range(0, self.slots, step)
        ]

    def read(self, partition: _SlotRange):
        for slot in range(partition.start, partition.end):
            yield (slot, _intensity(slot, partition.base))


class _CarbonGridStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the grid (Spark 4 ``simpleStreamReader``): each
    micro-batch emits the next ``batch_slots`` slots; the OFFSET is the
    slot index, so progress is exactly-once restartable from the
    checkpoint (the reader is a pure function of the offset range — replay
    of a committed range regenerates identical rows). ``slots`` bounds the
    stream so availableNow drains it deterministically in tests."""

    def __init__(self, options):
        self.slots = max(0, int(options.get("slots", 3600)))
        self.base = int(options.get("base", 100))
        self.batch_slots = max(1, int(options.get("batch_slots", 600)))

    def initialOffset(self):
        return {"slot": 0}

    def read(self, start):
        lo = int(start["slot"])
        hi = min(lo + self.batch_slots, self.slots)
        rows = [(s, _intensity(s, self.base)) for s in range(lo, hi)]
        return iter(rows), {"slot": hi}

    def readBetweenOffsets(self, start, end):
        # replay of a committed range after restart — must be identical
        lo, hi = int(start["slot"]), int(end["slot"])
        return iter((s, _intensity(s, self.base)) for s in range(lo, hi))


class CarbonGridDataSource(DataSource):
    """``spark.read.format("carbon_grid")`` / ``spark.readStream`` —
    see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "carbon_grid"

    def schema(self):
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CarbonGridReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CarbonGridStreamReader(self.options)


def register_carbon_grid(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(CarbonGridDataSource)
