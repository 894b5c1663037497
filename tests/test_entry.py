"""Driver-contract smoke: entry() and the registry are well-formed."""

import __spark_entry__ as entry


def test_entry_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 20
    cols = set(df.columns)
    assert cols == {"NAME", "n_points"}
    assert all(r.n_points > 0 for r in rows)


def test_registry_shape():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 20
    # every oracle key has a query; rows-only queries are the only
    # entries allowed to lack an oracle
    assert set(oracles) <= set(qs)
    # every query is oracle-gated (ann recall got its oracle in r3)
    assert set(qs) == set(oracles)
    for sql in oracles.values():
        assert "SELECT" in sql.upper()


def test_one_query_runs_at_smallest_sf(spark, sf_dir):
    df = entry.queries()["q5_region_revenue"](spark, sf_dir)
    assert df.count() > 0
