"""Declarative source specs → ``spark.read`` plans.

(reference: raise_/transforms/source.py:25-348 — ObjectStorage/FileSystem/
Columnar/FeatureGroup/Database sources and the format whitelist)

Every source compiles to a plain DataFrame read, so Catalyst keeps predicate
pushdown, column pruning, and (for Hive-style ``k=v/`` layouts) partition
pruning on the fast path. ``filter``/``columns`` are applied immediately
after the scan — ``.explain`` shows them as PushedFilters/ReadSchema on the
parquet scan node, which is exactly the 100 TB posture: never read a byte
the query doesn't need.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# reference: raise_/transforms/source.py:25-34
FORMATS = frozenset(
    {"parquet", "csv", "json", "jsonl", "avro", "orc", "delta", "iceberg"}
)


def _check_format(fmt: str) -> str:
    f = fmt.lower()
    if f not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(FORMATS)}")
    return "json" if f == "jsonl" else f


@dataclass
class ObjectStorageSource:
    """``s3://``/``gs://``/``az://`` (or local) path scan with Hive-style
    partition appends (reference: raise_/transforms/source.py:77-154).

    ``with_partition("dt", "2024-01-01")`` narrows the scan path itself —
    on object storage that is a prefix listing, i.e. true partition pruning
    before any file is opened.
    """

    path: str
    format: str = "parquet"
    partition_columns: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)
    alias: str | None = None
    _partition_values: list[tuple[str, str]] = field(default_factory=list)

    def with_partition(self, column: str, value: str) -> "ObjectStorageSource":
        out = ObjectStorageSource(
            path=self.path,
            format=self.format,
            partition_columns=self.partition_columns,
            options=dict(self.options),
            alias=self.alias,
        )
        out._partition_values = [*self._partition_values, (column, value)]
        return out

    @property
    def resolved_path(self) -> str:
        path = self.path.rstrip("/")
        for col, val in self._partition_values:
            path = f"{path}/{col}={val}"
        return path

    def read(self, spark: SparkSession) -> DataFrame:
        fmt = _check_format(self.format)
        reader = spark.read.format(fmt).options(**self.options)
        if fmt == "json" and self.format.lower() == "jsonl":
            reader = reader.option("multiLine", "false")
        return reader.load(self.resolved_path)


@dataclass
class FileSystemSource:
    """Local/NFS path + glob + recursive lookup
    (reference: raise_/transforms/source.py:158-203).

    ``schema`` (DDL string or StructType) pins the schema for
    schema-on-read formats (csv/json): it skips the inference pass (one
    fewer full scan of 100 TB of text) and keeps the column set stable
    when a directory is empty — an empty JSON dir otherwise reads as a
    zero-column relation."""

    path: str
    format: str = "parquet"
    glob: str | None = None
    recursive: bool = False
    options: dict[str, str] = field(default_factory=dict)
    schema: object | None = None  # DDL string or StructType
    alias: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        fmt = _check_format(self.format)
        reader = spark.read.format(fmt).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        if self.recursive:
            reader = reader.option("recursiveFileLookup", "true")
        if self.glob:
            reader = reader.option("pathGlobFilter", self.glob)
        return reader.load(self.path)


@dataclass
class ColumnarSource:
    """Warehouse table scan with projection + SQL filter
    (reference: raise_/transforms/source.py:207-264).

    ``table`` may be a registered table/view name or (here, for testability)
    a parquet path. Projection and filter land on the scan node.
    """

    table: str
    columns: list[str] | None = None
    filter: str | None = None
    alias: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        if self.table.endswith(".parquet") or "/" in self.table:
            df = spark.read.parquet(self.table)
        else:
            df = spark.table(self.table)
        if self.columns:
            df = df.select(*self.columns)
        if self.filter:
            df = df.where(self.filter)
        return df


@dataclass
class FeatureGroupSource:
    """Read another feature group (feature subset, version resolution,
    filter) — reference: raise_/transforms/source.py:268-306.

    ``group`` is a catalog FeatureGroup handle (raise_featurestore_spark.
    catalog.entities.FeatureGroup); versioned access ``name@v2`` resolves
    through the group's version map.
    """

    group: object  # catalog FeatureGroup (duck-typed: has .read(spark, features))
    features: list[str] | None = None
    filter: str | None = None
    alias: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        df = self.group.read(spark, self.features)
        if self.filter:
            df = df.where(self.filter)
        return df


@dataclass
class DatabaseSource:
    """JDBC scan, table or pushed-down query
    (reference: raise_/transforms/source.py:310-348).

    ``partition_column``/``num_partitions``/bounds map to Spark's JDBC
    parallel-read knobs so a big table scan fans out across executors
    instead of serializing through one connection. Exercised end-to-end
    against the embedded Derby engine on Spark's own classpath (see
    :func:`derby_fixture`); identifier caveat: Spark writes JDBC tables
    with quoted (case-sensitive) column names, so queries against
    Spark-written tables must double-quote lowercase identifiers.
    """

    url: str
    table: str | None = None
    query: str | None = None
    properties: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    alias: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        if bool(self.table) == bool(self.query):
            raise ValueError("DatabaseSource needs exactly one of table / query")
        reader = spark.read.format("jdbc").option("url", self.url)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.table:
            reader = reader.option("dbtable", self.table)
        else:
            reader = reader.option("query", self.query)
        if self.partition_column:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("numPartitions", str(self.num_partitions or 8))
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
            )
        return reader.load()


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_fixture(
    spark: SparkSession, df: DataFrame, db_path: str, table: str
) -> tuple[str, dict[str, str]]:
    """Seed an embedded Derby database with ``df`` (idempotent: skipped if
    the database directory already exists) and return ``(url, properties)``
    for a :class:`DatabaseSource`.

    Derby ships on Spark's classpath (it backs the Hive metastore), which
    makes it the one JDBC endpoint available in any Spark deployment with
    zero extra jars — ideal for exercising the real ``spark.read.jdbc``
    path in tests. Production DatabaseSources point the same options at
    Postgres/MySQL instead (reference: raise_/transforms/source.py:310-348).
    """
    import os

    url = f"jdbc:derby:{db_path};create=true"
    props = {"driver": DERBY_DRIVER}
    if not os.path.isdir(db_path):
        writer = df.coalesce(1).write.format("jdbc").option("url", url).option(
            "dbtable", table
        )
        for k, v in props.items():
            writer = writer.option(k, v)
        writer.mode("overwrite").save()
    return f"jdbc:derby:{db_path}", props


Source = (
    ObjectStorageSource
    | FileSystemSource
    | ColumnarSource
    | FeatureGroupSource
    | DatabaseSource
)


def read_source(spark: SparkSession, source: Source) -> DataFrame:
    return source.read(spark)
