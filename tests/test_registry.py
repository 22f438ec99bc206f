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
