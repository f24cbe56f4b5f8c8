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


# -- counts pinned against COVERAGE.md and the driver's 50-row budget --

DOCUMENTED_TOTAL = 181  # COVERAGE.md "181 named queries total"
DOCUMENTED_GRANULAR = 162
DOCUMENTED_SUITES = 19
DOCUMENTED_ROWS_ONLY = 2  # gen_transactions, stream_file_ingest


def test_documented_counts_match_registry():
    """COVERAGE.md's query arithmetic must equal the live registry —
    round 2 shipped queries without a doc refresh and the coverage doc
    drifted; this pins it."""
    from aws_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    suites = [n for n in qs if n.startswith("suite_")]
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    assert len(qs) == DOCUMENTED_TOTAL
    assert len(suites) == DOCUMENTED_SUITES
    assert len(qs) - len(suites) == DOCUMENTED_GRANULAR
    assert sorted(rows_only) == ["gen_transactions", "stream_file_ingest"]


def test_priority_fits_driver_budget():
    """The correctness driver verifies ~50 rows; every PRIORITY entry
    must get a verdict, so the block may never exceed 50. Slot layout:
    7 §2A flagships, 13 §2B granular flagships, 1 real-streaming row,
    10 LLM flagships (incl. both MLlib recall-tolerance rows), then
    all 19 family digests — granular rows whose family digest already
    covers them (window_ranking, fn_predicates, q7, q18) stay out."""
    from aws_etl_pipeline_spark.registry import PRIORITY, all_queries

    qs = all_queries()
    assert len(PRIORITY) <= 50
    assert len(set(PRIORITY)) == len(PRIORITY)
    # every family digest must be inside the budget
    suites = [n for n in qs if n.startswith("suite_")]
    assert set(suites) <= set(PRIORITY)
    # the round-2 zero-signal queries must now hold driver slots
    assert "dedup_minhash_mllib" in PRIORITY
    assert "sim_brp_lsh_mllib" in PRIORITY
