"""Sources & sinks (SURVEY.md §2.1/§2.2).

Primary data plane is the parquet lake (see ``catalog``); CSV covers the
reference's import/export edges, JDBC/REST are kept behind interfaces with
local implementations as default so tests never need a live database or API
(SURVEY.md §7.4.7 — the reference's own non-postgres branches raised
NotImplementedError, dx_group.py:112).
"""

from dataengineer_spark.sources.files import (
    read_csv,
    read_json,
    read_json_permissive,
    read_orc,
    read_parquet_merged,
    write_csv,
    write_json,
    write_orc,
)
from dataengineer_spark.sources.records import from_records
from dataengineer_spark.sources.jdbc import JdbcConfig, read_jdbc, write_jdbc
from dataengineer_spark.sources.rest import RestSource, RestSink

__all__ = [
    "read_csv",
    "write_csv",
    "read_json",
    "read_json_permissive",
    "write_json",
    "read_orc",
    "write_orc",
    "read_parquet_merged",
    "from_records",
    "JdbcConfig",
    "read_jdbc",
    "write_jdbc",
    "RestSource",
    "RestSink",
]
