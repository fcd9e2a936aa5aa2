from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.cleaning import (
    GOPHER_STOPWORDS,
    clean_lines_c4,
    gopher_quality_filter,
)


def _ref_gopher_keep(text: str, min_stop: int = 2) -> bool:
    """Independent pure-Python evaluation of the Gopher keep rule."""
    if text is None:
        return False
    words = [w for w in text.split(" ") if w]
    lines = text.split("\n")
    nw, nl = len(words), len(lines)
    if not (50 <= nw <= 100_000):
        return False
    mean_wl = sum(len(w) for w in words) / nw
    if not (3.0 <= mean_wl <= 10.0):
        return False
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) / 3
    if not (n_hash + n_ell) / nw < 0.1:
        return False
    if not sum(1 for l in lines if re.search(r"^[-*•] ", l)) / nl < 0.9:
        return False
    if not sum(1 for l in lines if re.search(r"\.\.\.$", l)) / nl < 0.3:
        return False
    if not sum(1 for w in words if re.search("[A-Za-z]", w)) / nw > 0.8:
        return False
    stops = {w.lower() for w in words} & set(GOPHER_STOPWORDS)
    if len(stops) < min_stop:
        return False
    return (nl - len(set(lines))) / nl < 0.3


def _ref_c4(text: str, min_words: int = 5, min_kept: int = 3):
    """Independent pure-Python C4 cleaning: returns (cleaned, n_lines,
    n_kept, keep)."""
    if text is None:
        return None, 0, 0, False
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]$', l) and len([w for w in l.split(" ") if w]) >= min_words
    ]
    keep = (
        len(kept) >= min_kept
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return ("\n".join(kept) if keep else None), len(lines), len(kept), keep


_c4_word = st.sampled_from(
    ["This", "is", "a", "proper", "sentence.", "short", "word!", "{", "lorem", "ipsum", "maybe?"]
)
_c4_line = st.lists(_c4_word, min_size=0, max_size=8).map(" ".join)
_c4_text = st.lists(_c4_line, min_size=1, max_size=6).map("\n".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_c4_text, min_size=1, max_size=12))
def test_c4_hypothesis_parity(spark, texts):
    """Property: line keeps, page rules, and the reconstructed cleaned
    text equal an independent pure-Python C4 evaluation."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_kept_lines, r.keep)
        for r in clean_lines_c4(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_c4(t), (i, t)


_word = st.sampled_from(
    ["the", "and", "table", "aa", "1234", "####", "...", "-", "order", "scan"]
)
_line = st.lists(_word, min_size=0, max_size=30).map(" ".join)
_gopher_text = st.lists(_line, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_gopher_text, min_size=1, max_size=12))
def test_gopher_hypothesis_parity(spark, texts):
    """Property: the operator's keep decision equals an independent
    pure-Python evaluation of every §A1.1 rule, over adversarial texts
    mixing stopwords, short words, digits, bullets, ellipses, hashes,
    and duplicate lines."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.keep
        for r in gopher_quality_filter(df, min_stopword_hits=2).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_gopher_keep(t), (i, t)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_and_page_rules(spark):
    good3 = (
        "This is the first proper sentence here.\n"
        "Here is another complete sentence for you.\n"
        "And a third sentence closes the page."
    )
    rows = [
        (1, good3),  # 3 kept lines -> keep
        (2, good3 + "\nshort line"),  # extra line dropped (no punct, <5 words)
        (3, "One good sentence is simply not enough."),  # <3 kept lines
        (4, good3 + "\nlorem ipsum dolor sit amet."),  # placeholder -> page drop
        (5, good3 + "\nvar x = { a: 1 }"),  # brace -> page drop
        (6, None),  # NULL passthrough
        (7, "no punctuation here at all\nstill none here friend"),  # 0 kept
    ]
    out = {r.doc_id: r for r in clean_lines_c4(_df(spark, rows)).collect()}
    assert len(out) == 7  # decisions, never silent drops
    assert out[1].keep and out[1].text == good3
    assert out[2].keep and out[2].text == good3 and out[2].n_kept_lines == 3
    assert out[2].n_lines == 4
    assert not out[3].keep and out[3].text is None
    assert not out[4].keep and not out[5].keep
    assert not out[6].keep and out[6].n_lines == 0
    assert not out[7].keep and out[7].n_kept_lines == 0


def test_c4_word_threshold_binds(spark):
    # punctuation but only 4 words: dropped at min_words_per_line=5
    rows = [(1, "Only four words here.\n" * 3)]
    out = clean_lines_c4(_df(spark, rows)).collect()[0]
    assert out.n_kept_lines == 0 and not out.keep
    out5 = clean_lines_c4(
        _df(spark, [(1, "Now five words are here.\n" * 3)]),
        min_words_per_line=5,
    ).collect()[0]
    assert out5.n_kept_lines == 3 and out5.keep


def test_gopher_rules_each_bind(spark):
    base_words = " ".join(["the", "and", "of", "table"] * 15)  # 60 words, stopwords
    rows = [
        (1, base_words),  # passes everything
        (2, " ".join(["word"] * 10)),  # too few words
        (3, " ".join(["ab"] * 60)),  # mean word len 2 < 3
        (4, base_words + " " + "#" * 1 + " #### ## #"),  # symbols
        (5, "\n".join(["- bullet item here now"] * 4)),  # bullet lines
        (6, base_words + "\n" + "\n".join(["trailing off..."] * 3)),  # ellipsis
        (7, " ".join(["1234"] * 60)),  # no alpha words
        (8, " ".join(["table", "scan", "fast"] * 20)),  # no stopwords
        (9, base_words + "\n" + "\n".join(["dup line"] * 4)),  # dup lines
        (10, None),
    ]
    out = {r.doc_id: r for r in gopher_quality_filter(_df(spark, rows)).collect()}
    assert out[1].keep
    assert not out[2].ok_word_count
    assert not out[3].ok_mean_word_len and out[3].mean_word_len == 2.0
    assert not out[4].ok_symbol_ratio
    assert not out[5].ok_bullet_lines
    assert not out[6].ok_ellipsis_lines
    assert not out[7].ok_alpha_words
    assert not out[8].ok_stopwords
    assert not out[9].ok_dup_lines
    assert not out[10].keep and out[10].n_words is None
    for d in range(2, 11):
        assert not out[d].keep


def test_gopher_include_input_collision_guard(spark):
    """Chaining after an operator that already emitted a 'keep' column
    must fail loud, not produce ambiguous references."""
    cleaned = clean_lines_c4(_df(spark, [(1, "Solid sentence with five words here.")]))
    try:
        gopher_quality_filter(cleaned, include_input=True)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "keep" in str(e) and "rename" in str(e)
    # and the non-colliding pipeline form works end-to-end
    docs = _df(spark, [(1, " ".join(["the", "word"] * 30))])
    out = gopher_quality_filter(docs, min_stopword_hits=1, include_input=True)
    assert out.columns[:2] == ["doc_id", "text"] and out.filter("keep").count() == 1


def test_gopher_sql_builder_cross_engine_parity(spark):
    """The shared DuckDB builder (gopher_metrics_ctes — feeding both
    the standalone face oracle and the e2e pipeline oracle) must agree
    with the Spark operator row-by-row on adversarial strings: unicode
    bullets, ellipsis-only lines, '#' runs, digit words, duplicate
    lines, empty lines, NULL."""
    import duckdb

    from schema_drift_detector_spark.operators.cleaning import gopher_metrics_ctes

    texts = [
        "• bullet one here\n• bullet two here",
        "- spaced bullet line\nplain line of words here",
        "trailing off now...\nand again it goes...",
        "#### ## # tagged text " + " ".join(["word"] * 60),
        " ".join(["1234", "5678"] * 30),
        " ".join(["the", "of", "and", "longword"] * 20),
        "dup\ndup\ndup\nunique",
        "\n\n",  # empty lines only
        "",  # empty text
        None,  # NULL
        " ".join(["the", "with"] * 30) + "\n- half bullets\n- more bullets",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.mean_word_len, *[r[c] for c in
                   ("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
                    "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
                    "ok_stopwords", "ok_dup_lines")], r.keep)
        for r in gopher_quality_filter(df, min_stopword_hits=1).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    sql = f"""
    WITH {gopher_metrics_ctes('g', 't', min_stopword_hits=1)}
    SELECT doc_id, nw, round(mean_wl, 6), ok_word_count, ok_mean_word_len,
           ok_symbol_ratio, ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words,
           ok_stopwords, ok_dup_lines, keep
    FROM ggq
    """
    oracle = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
    assert set(got) == set(oracle)
    for i in got:
        assert got[i] == oracle[i], (i, texts[i], got[i], oracle[i])


def test_cleaning_zero_shuffle_plans(spark):
    """Both hygiene passes are pure per-doc scans: no Exchange."""
    df = _df(spark, [(1, "a b c."), (2, "d e f!")])
    for op in (clean_lines_c4, gopher_quality_filter):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, op.__name__
