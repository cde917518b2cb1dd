"""Session-timezone independence of the events epoch math.

The driver runs queries() with ITS OWN SparkSession whose timezone we
don't control; DuckDB oracles treat the naive event timestamps as UTC.
workloads._ntz_as_utc_instant converts TIMESTAMP_NTZ to a UTC instant
via wall-clock arithmetic (timestampdiff from the NTZ epoch), so every
downstream unix_micros/unix_timestamp must produce the same numbers in
ANY session timezone — this test runs the events-epoch queries in a
Tokyo-timezone child session and compares against the DuckDB oracle.
"""

import duckdb
import pytest

from fspann_query_system_spark import workloads as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tokyo(spark):
    """Child session sharing the JVM but with a non-UTC timezone."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    return s


def _oracle(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.sql(sql).fetchall()


@pytest.mark.parametrize("name", ["session_attribution", "asof_enrich",
                                  "event_window_agg", "sessionization"])
def test_events_query_matches_oracle_in_tokyo_session(tokyo, name):
    sql = W.oracle_sql_map()[name]
    got = sorted(tuple(r) for r in W.QUERIES[name](tokyo, SF).collect())
    want = sorted(tuple(r) for r in _oracle(sql))
    assert got == want, f"{name} drifted under a non-UTC session timezone"
