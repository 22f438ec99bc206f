"""Registry governance: the query surface stays self-consistent."""

import __spark_entry__ as E


def test_every_query_is_callable_and_named():
    qs = E.queries()
    assert len(qs) >= 75
    for name, fn in qs.items():
        assert callable(fn) and fn.__doc__, name
        assert name.replace("_", "").isalnum(), name


def test_every_oracle_has_a_query():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)


def test_rows_only_queries_document_why():
    """A query without an oracle must say so in its docstring (approx /
    float / stateful by design) — no silently unverified entries."""
    qs, oracles = E.queries(), E.oracle_sql()
    for name in set(qs) - set(oracles):
        doc = (qs[name].__doc__ or "").lower()
        assert any(w in doc for w in ("rows-only", "approximate", "no sql oracle")), name


def test_oracled_queries_return_scalar_columns_only(spark):
    """The driver's pandas canonicalizer factorizes object columns and
    cannot hash Python lists/dicts — an oracled query returning a
    top-level array/map/struct column is driver-RED even when values
    match (CORRECTNESS_r06: dq_quarantine / stream_quarantine,
    ``TypeError: unhashable type: 'list'``).  Lint every oracled
    query's output schema at sf0.001 so the class cannot recur;
    rows-only queries are exempt (driver compares row counts only)."""
    from pyspark.sql import types as T

    qs, oracles = E.queries(), E.oracle_sql()
    offenders = []
    for name in oracles:
        df = qs[name](spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"oracled queries with unhashable columns: {offenders}"


def test_verify_window_is_exactly_50_known_names():
    """The driver checks the FIRST 50 queries() entries.  r4's rotation
    list was 51 entries long, so entry #51 (stream_curate) silently
    missed its driver row — pin the list at exactly the window size and
    require every name to resolve so a miss cannot recur."""
    from hdfs_stream_processing_spark import queries as Q

    assert len(E._VERIFY_FIRST) == 50
    assert len(set(E._VERIFY_FIRST)) == 50
    unknown = [n for n in E._VERIFY_FIRST if n not in Q.QUERIES]
    assert not unknown, f"rotation names not registered: {unknown}"
    # and the rotation actually controls dict order
    assert list(E.queries())[:50] == E._VERIFY_FIRST
