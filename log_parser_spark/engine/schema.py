"""Schemas for the records table (output of the parse stage) and the
pages input table (BASELINE.json input_hint)."""

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

# One row per typed record emitted by the parse state machine.  Raw
# strings are kept raw (ts, payload_json, attrs values); typed casts
# happen in the per-kind branch selects where column pruning makes them
# free.
RECORDS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("entry_idx", T.LongType(), True),
    T.StructField("line_idx", T.LongType(), True),
    T.StructField("ts", T.StringType(), True),
    T.StructField("kind", T.StringType(), False),
    T.StructField("warn_type", T.StringType(), True),
    T.StructField("code_pos", T.StringType(), True),
    T.StructField("cf", T.StringType(), True),
    T.StructField("job_id", T.LongType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("value", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("time_micros", T.LongType(), True),
    T.StructField("payload_json", T.StringType(), True),
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("msg", T.StringType(), True),
])

RECORD_FIELDS = [f.name for f in RECORDS_SCHEMA.fields]

# Permissive schema for the fixed event-payload fields used by joins,
# sinks and aggregates (events.py:53-93).  Dynamic keys (files_L<N>) and
# table_properties stay in payload_json / are extracted where needed.
EVENT_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("job", T.LongType(), True),
    T.StructField("flush_reason", T.StringType(), True),
    T.StructField("compaction_reason", T.StringType(), True),
    T.StructField("num_entries", T.LongType(), True),
    T.StructField("num_deletes", T.LongType(), True),
    T.StructField("num_memtables", T.LongType(), True),
    T.StructField("total_data_size", T.LongType(), True),
    T.StructField("input_data_size", T.LongType(), True),
    T.StructField("compaction_time_micros", T.LongType(), True),
    T.StructField("compaction_time_cpu_micros", T.LongType(), True),
    T.StructField("output_level", T.LongType(), True),
    T.StructField("num_output_files", T.LongType(), True),
    T.StructField("num_input_records", T.LongType(), True),
    T.StructField("num_output_records", T.LongType(), True),
    T.StructField("total_output_size", T.LongType(), True),
    T.StructField("file_number", T.LongType(), True),
    T.StructField("file_size", T.LongType(), True),
    T.StructField("table_properties", T.StructType([
        T.StructField("column_family_id", T.LongType(), True),
        T.StructField("data_size", T.LongType(), True),
        T.StructField("index_size", T.LongType(), True),
        T.StructField("filter_size", T.LongType(), True),
        T.StructField("filter_policy", T.StringType(), True),
        T.StructField("num_filter_entries", T.LongType(), True),
        T.StructField("num_data_blocks", T.LongType(), True),
        T.StructField("num_entries", T.LongType(), True),
        T.StructField("raw_key_size", T.LongType(), True),
        T.StructField("raw_value_size", T.LongType(), True),
        T.StructField("compression", T.StringType(), True),
    ]), True),
])
