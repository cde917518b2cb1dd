"""Defensive schema probe for the driver-generated /root/testdata fixtures.

The driver regenerates the parquet tables between rounds and has already
changed a physical type once (events.ts: TIMESTAMP(NANOS) -> MICROS),
which broke eight things at once with confusing errors.  This test pins
the COLUMN SET and the semantic type family of every table so the next
drift costs one obvious failure with a clear message instead.

Intentionally tolerant of representation changes load_events already
absorbs (ts as long / timestamp / timestamp_ntz all pass).
"""

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

# table -> {column: allowed pyarrow type-family prefixes}
EXPECTED = {
    "region": {"r_regionkey": ("int",), "r_name": ("string", "large_string")},
    "nation": {"n_nationkey": ("int",), "n_regionkey": ("int",)},
    "customer": {"c_custkey": ("int",), "c_nationkey": ("int",)},
    "supplier": {"s_suppkey": ("int",), "s_nationkey": ("int",)},
    "part": {"p_partkey": ("int",)},
    "orders": {"o_orderkey": ("int",), "o_custkey": ("int",),
               "o_orderdate": ("date", "timestamp"),
               "o_totalprice": ("double", "float", "decimal")},
    "lineitem": {"l_orderkey": ("int",), "l_partkey": ("int",),
                 "l_quantity": ("double", "float", "decimal", "int"),
                 "l_extendedprice": ("double", "float", "decimal"),
                 "l_discount": ("double", "float", "decimal"),
                 "l_shipdate": ("date", "timestamp")},
    "events": {"event_id": ("int",), "user_id": ("int",),
               "event_type": ("string", "large_string"),
               "value": ("double", "float"),
               "ts": ("timestamp", "int"),   # micros / ntz / nanos-as-long
               "props": ("string", "large_string")},
    "documents": {"doc_id": ("int",),
                  "source": ("string", "large_string", "dictionary"),
                  "text": ("string", "large_string")},
    "embeddings": {"vec_id": ("int",),
                   "embedding": ("list", "large_list", "fixed_size_list")},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(table):
    schema = pq.read_schema(f"{SF}/{table}.parquet")
    cols = dict(zip(schema.names, schema.types))
    for col, families in EXPECTED[table].items():
        assert col in cols, (
            f"FIXTURE DRIFT: {table}.parquet lost column {col!r} "
            f"(driver regenerated the testdata?). Present: {schema.names}")
        t = str(cols[col])
        assert any(t.startswith(f) for f in families), (
            f"FIXTURE DRIFT: {table}.{col} is now {t!r}, expected one of "
            f"{families}. The driver regenerated the testdata with a new "
            f"physical type — update the loaders (see workloads.load_events "
            f"for the events.ts precedent) and this probe.")


def test_load_events_absorbs_nanos_parquet(spark, tmp_path):
    """The driver shipped events.ts as TIMESTAMP(NANOS) in earlier rounds
    and may again: load_events must absorb a nanos file via the legacy
    nanosAsLong retry + micros conversion, leaving the session conf
    unpolluted."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq
    from fspann_query_system_spark.workloads import load_events

    path = str(tmp_path / "events.parquet")
    ts = pa.array([dt.datetime(2024, 1, 1, 10, 0, 0),
                   dt.datetime(2024, 1, 1, 10, 5, 0)],
                  type=pa.timestamp("ns"))
    pq.write_table(pa.table({"event_id": pa.array([1, 2], pa.int64()),
                             "ts": ts}), path,
                   coerce_timestamps=None, store_schema=False)
    assert str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"

    out = load_events(spark, path)
    assert out.schema["ts"].dataType.typeName().startswith("timestamp")
    got = sorted(r.ts for r in out.collect())
    assert [g.replace(tzinfo=None) for g in got] == [
        dt.datetime(2024, 1, 1, 10, 0, 0), dt.datetime(2024, 1, 1, 10, 5, 0)]
    # conf left unset or restored (get validates the default's type, so
    # probe with a boolean-shaped default)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
                          "false") == "false"
