"""REST API source (S5) / upload sink (K4).

The reference fetched records from a REST endpoint on the driver
(``get_messages(api_url, date_from, date_to, api_token)`` → records →
DataFrame, reference diagnostic_group_pipeline_with_api.py:102-103) and
POSTed the exported file back (``save_data(api_url, path, token)``,
:316). Engine design:

- small fetches: driver-side, records → ``createDataFrame`` (same shape).
- scale path: build a DataFrame of page descriptors and fetch inside
  ``mapInPandas`` so N executors pull N pages concurrently — the fetch
  becomes a narrow distributed stage instead of a driver bottleneck.

The HTTP call itself is injectable (``fetch_fn``) and defaults to a stub
that raises — tests supply a fake, production supplies urllib/requests.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FetchFn = Callable[[str, dict], list[dict]]


def _default_fetch(url: str, params: dict) -> list[dict]:
    raise NotImplementedError(
        "no live HTTP in this environment; inject fetch_fn (tests) or wire "
        "urllib/requests in deployment"
    )


class RestSource:
    """S5 — paged REST source."""

    def __init__(self, api_url: str, api_token: str = "", fetch_fn: FetchFn | None = None):
        self.api_url = api_url
        self.api_token = api_token
        self.fetch_fn = fetch_fn or _default_fetch

    def fetch(
        self,
        spark: SparkSession,
        date_from: str,
        date_to: str,
        schema: T.StructType,
    ) -> DataFrame:
        """Driver-side fetch → DataFrame (the reference's exact shape)."""
        records = self.fetch_fn(
            self.api_url,
            {"date_from": date_from, "date_to": date_to, "token": self.api_token},
        )
        return spark.createDataFrame(records, schema=schema)

    def fetch_partitioned(
        self,
        spark: SparkSession,
        pages: Sequence[dict],
        schema: T.StructType,
    ) -> DataFrame:
        """Scale path: one row per page descriptor, fetched executor-side.

        ``pages`` is driver-built metadata (tiny); payloads are pulled in
        parallel inside ``mapInPandas`` and never touch the driver.
        """
        fetch_fn, url, token = self.fetch_fn, self.api_url, self.api_token
        page_df = spark.createDataFrame(
            [(json.dumps(p),) for p in pages], schema="page_json string"
        ).repartition(max(len(pages), 1))  # one fetch task per page

        field_names = schema.fieldNames()

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[dict] = []
                for page_json in pdf["page_json"]:
                    params = json.loads(page_json)
                    params["token"] = token
                    rows.extend(fetch_fn(url, params))
                yield pd.DataFrame(rows, columns=field_names)

        return page_df.mapInPandas(run, schema=schema)


class RestSink:
    """K4 — publish an exported result to the API.

    Driver-side POST of a small export (the reference's shape), or
    ``foreachPartition`` for row-wise bulk upload.
    """

    def __init__(self, api_url: str, api_token: str = "", post_fn: FetchFn | None = None):
        self.api_url = api_url
        self.api_token = api_token
        self.post_fn = post_fn or _default_fetch

    def upload(self, df: DataFrame, batch_size: int = 500) -> None:
        post_fn, url, token = self.post_fn, self.api_url, self.api_token

        def send_partition(rows) -> None:
            buf = []
            for row in rows:
                buf.append(row.asDict())
                if len(buf) >= batch_size:
                    post_fn(url, {"token": token, "records": buf})
                    buf = []
            if buf:
                post_fn(url, {"token": token, "records": buf})

        df.foreachPartition(send_partition)
