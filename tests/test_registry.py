"""Driver-contract invariants: the registry must stay consistent with
what __spark_entry__ exposes."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 100


def test_rows_only_queries_documented():
    from aws_etl_pipeline_spark.registry import all_queries

    for name, q in all_queries().items():
        if q.oracle is None:
            assert q.doc, f"{name} is rows-only and must explain why in its docstring"
            assert "rows-only" in q.doc, name


def test_oracle_sql_is_single_statement():
    for name, sql in entry.oracle_sql().items():
        assert ";" not in sql.rstrip().rstrip(";"), f"{name}: multi-statement oracle"
        assert sql.strip(), name
