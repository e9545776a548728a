"""Generate a 10x scale probe dataset (sf1) from the driver's sf0.1
parquet, for the SCALE.md wall-clock probes ONLY — never for oracle
correctness (the driver's generator is the source of truth; this is a
key-offset replication with per-copy perturbations so dedup/ANN
workloads aren't degenerate 10-way exact duplicates).

Writes /tmp/spark_graft_sf1/{table}.parquet. Deterministic: copy index
is the only varying input. Dimensions (region, nation) keep their real
cardinality — at any scale they stay broadcast-sized, like production.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
COPIES = 10

# max-key offsets derived once so every FK shifts consistently
OFF = {
    "orderkey": 600_000,  # > max o_orderkey at sf0.1
    "custkey": 15_000,
    "partkey": 20_000,
    "suppkey": 1_000,
    "doc": 5_000,
    "vec": 2_000,
    "event": 100_000,
    "user": 10_000,  # > max user_id
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({COPIES})) AS c")

    def gen(table: str, select: str) -> None:
        out = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {select} FROM '{SRC}/{table}.parquet' t "
            f"CROSS JOIN copies ORDER BY c) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")

    # dims stay as-is (single copy)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: unscaled dim")

    gen(
        "customer",
        f"c_custkey + c*{OFF['custkey']} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment",
    )
    gen(
        "supplier",
        f"s_suppkey + c*{OFF['suppkey']} AS s_suppkey, s_name, s_nationkey, "
        "s_acctbal",
    )
    gen(
        "part",
        f"p_partkey + c*{OFF['partkey']} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice",
    )
    gen(
        "orders",
        f"o_orderkey + c*{OFF['orderkey']} AS o_orderkey, "
        f"o_custkey + c*{OFF['custkey']} AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority",
    )
    gen(
        "lineitem",
        f"l_orderkey + c*{OFF['orderkey']} AS l_orderkey, "
        f"l_partkey + c*{OFF['partkey']} AS l_partkey, "
        f"l_suppkey + c*{OFF['suppkey']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    gen(
        "events",
        f"event_id + c*{OFF['event']} AS event_id, ts, "
        f"user_id + c*{OFF['user']} AS user_id, event_type, value, props",
    )
    # per-copy text tag: shingle sets shift slightly so near-dup pair
    # generation sees realistic near-misses, not 10-way exact clones
    gen(
        "documents",
        f"doc_id + c*{OFF['doc']} AS doc_id, "
        "CASE WHEN c = 0 THEN text ELSE text || ' probe' || c END AS text, "
        "lang, source, n_chars",
    )
    # per-copy small rotation-free perturbation keeps vectors distinct
    # but preserves norms approximately (ANN cells stay balanced)
    gen(
        "embeddings",
        f"vec_id + c*{OFF['vec']} AS vec_id, "
        "list_transform(embedding, e -> e + c * 0.0001) AS embedding, "
        "label",
    )


if __name__ == "__main__":
    main()
