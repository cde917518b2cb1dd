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
