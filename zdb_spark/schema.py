"""Schema layer: zdb's fixed, explicit column schema re-expressed for Spark.

Reference semantics (SURVEY.md §1.2):
- ``ColumnType`` enum with fixed byte widths: /root/reference/src/schema.rs:4-55
- builder API ``Schema::new().add_cols(...).partition_by(...)``:
  /root/reference/src/schema.rs:105-139
- per-column ``resolution`` (nanoseconds per tick) used to compress stored
  timestamps: /root/reference/src/schema.rs:28-29,141-166

Our mapping keeps the *logical* model and delegates the physical tricks
(dictionary encoding, delta/width compression) to Parquet:
- Timestamp  -> LongType epoch-nanos canonical column (Spark TimestampType is
  only µs precision), plus derived ``<ts>_utc`` TimestampType and ``dt``
  DateType partition column materialized by the Table write path.
- Symbol8/16/32 -> StringType (Parquet dictionary pages replace the sidecar
  ``.symbols`` files; this also dodges the reference's 1-based-dictionary
  off-by-one decode bug noted at /root/reference/src/table/scan.rs:134-136).
- U8->ShortType, U16->IntegerType, U32->LongType, U64->LongType by default
  (documented overflow caveat; reference test volumes stay < 1e9,
  /root/reference/tests/main.rs:53) or DecimalType(20,0) when
  ``strict_u64=True``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from pyspark.sql import types as T

__all__ = ["ColumnType", "Column", "PartitionBy", "Schema"]


class ColumnType(enum.Enum):
    """Mirror of zdb's ColumnType (/root/reference/src/schema.rs:4-20)."""

    TIMESTAMP = "timestamp"
    SYMBOL8 = "symbol8"
    SYMBOL16 = "symbol16"
    SYMBOL32 = "symbol32"
    I8 = "i8"
    I16 = "i16"
    I32 = "i32"
    I64 = "i64"
    U8 = "u8"
    U16 = "u16"
    U32 = "u32"
    U64 = "u64"
    F32 = "f32"
    F64 = "f64"


_SPARK_TYPES: dict[ColumnType, T.DataType] = {
    ColumnType.TIMESTAMP: T.LongType(),  # epoch nanoseconds
    ColumnType.SYMBOL8: T.StringType(),
    ColumnType.SYMBOL16: T.StringType(),
    ColumnType.SYMBOL32: T.StringType(),
    ColumnType.I8: T.ByteType(),
    ColumnType.I16: T.ShortType(),
    ColumnType.I32: T.IntegerType(),
    ColumnType.I64: T.LongType(),
    ColumnType.U8: T.ShortType(),
    ColumnType.U16: T.IntegerType(),
    ColumnType.U32: T.LongType(),
    ColumnType.U64: T.LongType(),
    ColumnType.F32: T.FloatType(),
    ColumnType.F64: T.DoubleType(),
}

_STRICT_U64 = T.DecimalType(20, 0)

_SYMBOL_TYPES = {ColumnType.SYMBOL8, ColumnType.SYMBOL16, ColumnType.SYMBOL32}


class PartitionBy(enum.Enum):
    """Partition granularity (/root/reference/src/table/write.rs:26-36)."""

    NONE = "all"
    YEAR = "year"
    MONTH = "month"
    DAY = "day"

    @property
    def date_format(self) -> str | None:
        return {"all": None, "year": "yyyy", "month": "yyyy-MM",
                "day": "yyyy-MM-dd"}[self.value]


@dataclass(frozen=True)
class Column:
    """One declared column (/root/reference/src/schema.rs:22-38)."""

    name: str
    ctype: ColumnType
    # nanoseconds per tick; storage-compression hint in the reference
    # (/root/reference/src/schema.rs:60-63) — retained here as a semantic
    # fact (e.g. "1-minute bars") used for resample defaults only.
    resolution: int = 1

    def spark_type(self, strict_u64: bool = False) -> T.DataType:
        if strict_u64 and self.ctype is ColumnType.U64:
            return _STRICT_U64
        return _SPARK_TYPES[self.ctype]

    @property
    def is_symbol(self) -> bool:
        return self.ctype in _SYMBOL_TYPES


@dataclass
class Schema:
    """Builder mirroring Schema::new().add_cols().partition_by()
    (/root/reference/src/schema.rs:105-139).

    Column 0 is always the timestamp column (zdb hard invariant #1,
    /root/reference/src/table/write.rs:66-113): constructing a Schema
    injects ``ts`` first, like the reference's ``Schema::new``.
    """

    name: str
    columns: list[Column] = field(default_factory=list)
    partition_by: PartitionBy = PartitionBy.NONE
    strict_u64: bool = False
    # Reference surface parity (/root/reference/src/schema.rs:85,
    # write.rs:88-93): round-robin striping of partition dirs across
    # local disks.  Recorded and round-tripped so schemas port losslessly,
    # but intentionally NOT used for placement: on a distributed
    # filesystem the block layer stripes (SURVEY.md §4) — a driver-chosen
    # disk list would fight, not help, HDFS/S3 placement.
    partition_dirs: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.columns or self.columns[0].ctype is not ColumnType.TIMESTAMP:
            self.columns = [Column("ts", ColumnType.TIMESTAMP), *self.columns]

    # -- builder methods (chainable, like the Rust builder) -----------------
    def add_col(self, name: str, ctype: ColumnType, resolution: int = 1) -> "Schema":
        if any(c.name == name for c in self.columns):
            raise ValueError(f"duplicate column {name!r}")
        self.columns.append(Column(name, ctype, resolution))
        return self

    def add_cols(self, cols: list[tuple[str, ColumnType]]) -> "Schema":
        for name, ctype in cols:
            self.add_col(name, ctype)
        return self

    def with_partition_by(self, p: PartitionBy) -> "Schema":
        self.partition_by = p
        return self

    def with_resolution(self, resolution: int) -> "Schema":
        """Set the timestamp column's resolution
        (/root/reference/src/schema.rs:60-63)."""
        ts = self.columns[0]
        self.columns[0] = Column(ts.name, ts.ctype, resolution)
        return self

    # -- accessors ----------------------------------------------------------
    @property
    def ts_col(self) -> str:
        return self.columns[0].name

    @property
    def resolution(self) -> int:
        return self.columns[0].resolution

    @property
    def symbol_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_symbol]

    def column(self, name: str) -> Column:
        for c in self.columns:
            if c.name == name:
                return c
        # mirror of the reference's unknown-column panic
        # (/root/reference/src/table/scan.rs:43-59)
        raise KeyError(f"column {name!r} not in table {self.name!r}")

    def spark_schema(self) -> T.StructType:
        return T.StructType([
            T.StructField(c.name, c.spark_type(self.strict_u64), nullable=False)
            for c in self.columns
        ])

    # -- (de)serialization for the _meta sidecar ---------------------------
    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "partition_by": self.partition_by.value,
            "strict_u64": self.strict_u64,
            "partition_dirs": list(self.partition_dirs),
            "columns": [
                {"name": c.name, "type": c.ctype.value, "resolution": c.resolution}
                for c in self.columns
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Schema":
        cols = [Column(c["name"], ColumnType(c["type"]), c.get("resolution", 1))
                for c in d["columns"]]
        return cls(name=d["name"], columns=cols,
                   partition_by=PartitionBy(d["partition_by"]),
                   strict_u64=d.get("strict_u64", False),
                   partition_dirs=list(d.get("partition_dirs", [])))
