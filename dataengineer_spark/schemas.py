"""Explicit StructType schemas.

The reference's schemas existed only as Python lists of column names
(dx_group.py:152,164,214,224; prostate_dag.py:180-200) with inferred types;
here every table is declared (SURVEY.md §1.4) so scans prune columns and
writes are stable. Two families:

- reference-shaped tables (batch audit, cleaned/preped/prediction, model /
  labels / section_regex config) reconstructed from call sites — FIXTURES.md §B
- driver synthetic test tables (TPC-H-ish star + events/documents/embeddings)
  — FIXTURES.md §A.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md §B)
# --------------------------------------------------------------------------

BATCH = T.StructType([
    # batch row is engine-allocated, id non-null (reference dx_group.py:96-116)
    T.StructField("batch_id", T.LongType(), False),
    T.StructField("pipeline_name", T.StringType(), True),
    T.StructField("date_from", T.StringType(), True),   # 'YYYYMMDD' at edges
    T.StructField("date_to", T.StringType(), True),
    T.StructField("comment", T.StringType(), True),
])

CLEANED_DATA = T.StructType([
    T.StructField("batch_id", T.LongType(), False),
    T.StructField("msgid", T.LongType(), True),
    T.StructField("msg", T.StringType(), True),
])

# section columns produced by the F4 sectionizer (reference dx_group.py:163-164)
SECTION_FIELDS = [
    "gross", "addendum", "diagnosis", "diagnosis_comment", "micro",
    "filtered_message", "part_of_report",
]

PREPED_DATA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("msgid", T.LongType(), True),
    ]
    + [T.StructField(f, T.StringType(), True) for f in SECTION_FIELDS]
)

MODEL = T.StructType([
    T.StructField("model_id", T.LongType(), False),
    T.StructField("model_name", T.StringType(), True),
    T.StructField("model_version", T.IntegerType(), True),
    T.StructField("model_location", T.StringType(), True),
])

SECTION_REGEX = T.StructType([
    # one regex variant per BC health authority (reference dx_group.py:176-182)
    T.StructField("model_id", T.LongType(), False),
    T.StructField("parent_category", T.StringType(), True),
    T.StructField("nha", T.StringType(), True),
    T.StructField("fha", T.StringType(), True),
    T.StructField("fha2", T.StringType(), True),
    T.StructField("iha", T.StringType(), True),
    T.StructField("vcha1", T.StringType(), True),
    T.StructField("vcha2", T.StringType(), True),
])

LABELS = T.StructType([
    T.StructField("model_id", T.LongType(), False),
    T.StructField("label", T.LongType(), False),
    T.StructField("label_name", T.StringType(), True),
])

PREDICTION_TABLE = T.StructType([
    T.StructField("batch_id", T.LongType(), False),
    T.StructField("msgid", T.LongType(), True),
    T.StructField("predicted_label", T.LongType(), True),
    T.StructField("model_score", T.DoubleType(), True),
    T.StructField("model_id", T.LongType(), True),
])

MODEL_QUESTIONS = T.StructType([
    T.StructField("model_id", T.LongType(), False),
    T.StructField("sections", T.StringType(), True),
    T.StructField("questions", T.StringType(), True),
])

# API export schema (reference diagnostic_group_pipeline_with_api.py:312-313)
API_EXPORT_COLUMNS = [
    "batchid", "msgid", "predicted_label_id", "model_score", "model_id",
    "predicted_label",
]

# prostate fan-in output: msg_id + 9 prediction/score pairs
# (reference prostate_dag.py:180-200)
PROSTATE_PRED_FIELDS = [
    "site_code", "histology_code", "behaviour_code", "laterality",
    "lymph_vascular_invasion", "invasive_surgery_flag",
    "addendum_section_flag", "diagnostic_procedure_flag",
    "neoadjuvant_therapy_flag",
]

PROSTATE_OUTPUT = T.StructType(
    [T.StructField("msg_id", T.LongType(), False)]
    + [
        f
        for name in PROSTATE_PRED_FIELDS
        for f in (
            T.StructField(name, T.StringType(), True),
            T.StructField(f"{name}_pred_score", T.DoubleType(), True),
        )
    ]
)

# --------------------------------------------------------------------------
# Driver synthetic test tables (FIXTURES.md §A)
# --------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), True),
    T.StructField("r_name", T.StringType(), True),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), True),
    T.StructField("n_name", T.StringType(), True),
    T.StructField("n_regionkey", T.IntegerType(), True),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), True),
    T.StructField("c_name", T.StringType(), True),
    T.StructField("c_nationkey", T.IntegerType(), True),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), True),
    T.StructField("s_name", T.StringType(), True),
    T.StructField("s_nationkey", T.IntegerType(), True),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), True),
    T.StructField("p_name", T.StringType(), True),
    T.StructField("p_brand", T.StringType(), True),
    T.StructField("p_type", T.StringType(), True),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), True),
    T.StructField("o_custkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), True),
    T.StructField("o_orderpriority", T.StringType(), True),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), True),
    T.StructField("l_partkey", T.LongType(), True),
    T.StructField("l_suppkey", T.LongType(), True),
    T.StructField("l_linenumber", T.IntegerType(), True),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),  # ns in parquet → µs in Spark
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

# as the parquet scan surfaces it under spark.sql.legacy.parquet.nanosAsLong
# (ns-precision ts reads as an ns-long; testdata.load_table converts)
EVENTS_RAW = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType(), True)
        for f in EVENTS.fields
    ]
)

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# multimodal extension: opaque binary payload + typed metadata (SURVEY §2.9)
MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # 'image' | 'audio' | 'video'
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])
