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


def test_scale_md_preserves_cited_evidence_sections():
    """Commit 3d1f4e1 regenerated SCALE.md and silently deleted the
    hand-written evidence sections GATE_r13 cited (VERDICT r13 #1).
    The generators now replace only their own sections behind an
    explicit end marker; pin that the marker and every cited
    hand-written section exist at HEAD so a clobber is a test failure,
    not an archaeology exercise."""
    with open("/root/repo/SCALE.md") as f:
        text = f.read()
    assert "<!-- scale_sf1:end" in text
    for section in (
        "## sf1 probe",
        "## Round-12: scale notes",
        "## Round-13: source-scaled perceptual probe",
    ):
        assert section in text, f"SCALE.md lost cited section: {section}"
    # hand-written sections must sit BELOW the marker so regeneration
    # (which rewrites only above it) cannot touch them
    marker_at = text.index("<!-- scale_sf1:end")
    assert text.index("## Round-12: scale notes") > marker_at
    assert text.index("## Round-13: source-scaled") > marker_at


def test_scale_sf1_rewrite_preserves_hand_written_tail():
    """Pure-function check of the regeneration path itself: rewriting
    the sf1 section must keep the hand-written appendix byte-for-byte,
    both for marker-bearing files and legacy pre-marker files."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_sf1_mod", "/root/repo/tools/scale_sf1.py"
    )
    # import only the pure parts: exec the module source up to main()
    src = open("/root/repo/tools/scale_sf1.py").read()
    ns = {"__file__": "/root/repo/tools/scale_sf1.py"}
    exec(src[: src.index("def main()")].replace(
        "from hdfs_stream_processing_spark import get_spark", ""
    ).replace(
        "from hdfs_stream_processing_spark import queries as Q", ""
    ).replace("from pyspark.sql import functions as F", ""), ns)
    rewrite, marker = ns["rewrite_scale_md"], ns["END_MARKER"]

    hand = "## Round-12: scale notes\n\nkept\n\n## Round-13: probe\n\ntable\n"
    new_section = ["", "## sf1 probe (new)", "", "| q | a | b | f |"]
    # marker-bearing file
    old = "# head\n\n## sf1 probe (old)\n\n| x |\n\n" + marker + "\n\n" + hand
    out = rewrite(old, new_section)
    assert "## sf1 probe (new)" in out and "## sf1 probe (old)" not in out
    assert hand.rstrip("\n") in out and out.count(marker) == 1
    # legacy file without marker: tail recovered from "## Round-"
    legacy = "# head\n\n## sf1 probe (old)\n\n| x |\n\n" + hand
    out2 = rewrite(legacy, new_section)
    assert "## sf1 probe (new)" in out2
    assert "## Round-12: scale notes" in out2 and marker in out2
    # idempotent: a second rewrite keeps the tail again
    out3 = rewrite(out2, new_section)
    assert "## Round-13: probe" in out3 and out3.count(marker) == 1
