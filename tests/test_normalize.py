"""Unicode normalization: canonical-rule semantics, Spark/Python/DuckDB
three-way parity (incl. a hypothesis sweep), NULL contract."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from schema_drift_detector_spark.functions.normalize import (
    normalize_sql,
    normalize_text_arrow,
    normalize_text_py,
)

CASES = [
    "Café and NAÏVE",  # decomposed accents -> NFC composes
    "bell\x07s\x00 and\ttabs",  # controls stripped, tab -> space
    "  double  spaces \r\n crlf line ",  # collapse + CRLF->LF + trim
    "a b c　d",  # unicode space separators
    "line one   \n   line two\n\nline three",  # line-edge trim, blank line kept
    "ALL UPPER Ünïcödé",
    "",
]


def test_canonical_rule_semantics():
    assert normalize_text_py("Café") == "Café"
    assert normalize_text_py("a\x07b\x00c") == "abc"
    assert normalize_text_py("a\r\nb") == "a\nb"  # CR stripped, LF kept
    assert normalize_text_py("a    b") == "a b"
    assert normalize_text_py("  x \n y  ") == "x\ny"
    assert normalize_text_py("AÉ", lowercase=True) == "aé"
    assert normalize_text_py(None) is None
    assert normalize_text_py("") == ""
    # blank lines survive (only SPACE runs around newlines collapse)
    assert normalize_text_py("a\n\nb") == "a\n\nb"


@pytest.mark.parametrize("lowercase", [False, True])
def test_duckdb_parity_cases(lowercase):
    con = duckdb.connect()
    sql = normalize_sql("s", lowercase=lowercase)
    for c in CASES:
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS s)", [c]).fetchone()[0]
        assert got == normalize_text_py(c, lowercase=lowercase), repr(c)


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=40,
    )
)
def test_duckdb_parity_property(s):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {normalize_sql('s', lowercase=True)} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    assert got == normalize_text_py(s, lowercase=True)


def test_spark_column_matches_python(spark):
    rows = [(i, c) for i, c in enumerate(CASES)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id", normalize_text_arrow("text", lowercase=True).alias("norm")
        ).collect()
    }
    for i, c in enumerate(CASES):
        assert out[i] == normalize_text_py(c, lowercase=True)
    assert out[99] is None
