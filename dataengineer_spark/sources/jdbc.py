"""JDBC source/sink (S2/S3/K1 parity path).

The reference's data plane was Postgres via ``PostgresConn(host, db, user,
password, port).get_data(sql, columns)`` with whole-query pushdown
(reference dx_group.py:166-184) and a ``SqlserverConn`` sibling selected by
a ``db_type`` enum (dx_group.py:18,281). Spark's JDBC reader pushes the
same query down via ``option("query", sql)``; the dialect is a config
string here too. No postgres/sql-server driver jars ship in this
container, so the enum dialects are covered by config/URL-construction
tests — but the reader/writer THEMSELVES are integration-tested live
against embedded Apache Derby (ships inside the Spark distribution;
``tests/test_sources.py::TestJdbcLiveDerby`` round-trips an append
write, a whole-query pushdown, and the partitioned parallel fetch).
The parquet catalog is the default data plane.

Scale: a naive JDBC read is a single partition; ``partition_column`` +
bounds fans the read out across executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_DRIVERS = {
    "postgres": ("org.postgresql.Driver", "postgresql"),
    "sql-server": ("com.microsoft.sqlserver.jdbc.SQLServerDriver", "sqlserver"),
}


@dataclass(frozen=True)
class JdbcConfig:
    db_type: str  # 'postgres' | 'sql-server' — the reference's enum
    host: str
    database: str
    username: str
    password: str
    port: int

    def __post_init__(self) -> None:
        if self.db_type not in _DRIVERS:
            raise NotImplementedError(
                f"db_type {self.db_type!r} not supported (expected one of "
                f"{sorted(_DRIVERS)})"
            )

    @property
    def url(self) -> str:
        _, scheme = _DRIVERS[self.db_type]
        if self.db_type == "sql-server":
            return (
                f"jdbc:{scheme}://{self.host}:{self.port};"
                f"databaseName={self.database}"
            )
        return f"jdbc:{scheme}://{self.host}:{self.port}/{self.database}"

    @property
    def driver(self) -> str:
        return _DRIVERS[self.db_type][0]


def read_jdbc(
    spark: SparkSession,
    config: JdbcConfig,
    query: str | None = None,
    table: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S2/S3 — JDBC scan with whole-query pushdown (``query=``) or table

    scan (``table=``), optionally partitioned for parallel fetch."""
    if (query is None) == (table is None):
        raise ValueError("pass exactly one of query= or table=")
    reader = (
        spark.read.format("jdbc")
        .option("url", config.url)
        .option("driver", config.driver)
        .option("user", config.username)
        .option("password", config.password)
    )
    if query is not None:
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
        if partition_column is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", lower_bound)
                .option("upperBound", upper_bound)
                .option("numPartitions", num_partitions)
            )
    return reader.load()


def write_jdbc(
    df: DataFrame, config: JdbcConfig, table: str, mode: str = "append"
) -> None:
    """K1 parity — JDBC append (``conn.insert_data(df, table)``,

    reference dx_group.py:129)."""
    (
        df.write.format("jdbc")
        .option("url", config.url)
        .option("driver", config.driver)
        .option("user", config.username)
        .option("password", config.password)
        .option("dbtable", table)
        .mode(mode)
        .save()
    )
