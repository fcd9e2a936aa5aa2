"""URL metadata + RefinedWeb-style filtering (functions/urlmeta.py):
cross-engine parity over adversarial URLs, rule precedence, guards."""

import duckdb
import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.functions.urlmeta import (
    domain_blocked,
    url_host,
    url_host_sql,
    url_path,
    url_path_sql,
    url_soft_score,
    url_soft_score_sql,
    url_verdict,
    url_verdict_sql,
)

BLOCK = ["evil-ads.example", "spam.example"]
HARD = ["/xxx"]
SOFT = {"bonus": 1, "casino": 2, "free": 1}
TH = 3

URLS = [
    "https://docs.example.org/guide/1",
    "http://www.Evil-Ads.example/landing",          # exact via www+case canon
    "https://tracker.evil-ads.example/px.gif",      # subdomain suffix
    "https://evil-ads.example.com/not-blocked",     # suffix must NOT fire on a longer TLD
    "https://news.site.example/free-casino-bonus",  # soft 4 >= 3
    "https://free.example/free",                    # soft 2 < 3 -> pass
    "https://shop.example.io/xxx/promo",            # hard
    "https://spam.example",                         # no path
    "no-scheme.example/path?q=1#frag",
    "HTTPS://WWW.SPAM.EXAMPLE/UP",
    "", None,
    "https://host.example:8080/with-port",
    "https://freefreefree.example/",                # 3 'free' hits -> soft 3
    # blocklist-bypass vectors (regression): userinfo and trailing-dot
    # FQDN spellings of a blocked domain must still canonicalize to it
    "https://a@evil-ads.example/landing",
    "https://u:p@spam.example/x",
    "https://evil-ads.example./x",
    "https://www.evil-ads.example.../x",
]


def test_urlmeta_duckdb_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "i long, u string"
    )
    got = {
        r.i: (r.h, r.p, r.v, r.s)
        for r in df.select(
            "i",
            url_host("u").alias("h"),
            url_path("u").alias("p"),
            url_verdict("u", BLOCK, HARD, SOFT, TH).alias("v"),
            url_soft_score("u", SOFT).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT {url_host_sql('u')}, {url_path_sql('u')}, "
        f"{url_verdict_sql('u', BLOCK, HARD, SOFT, TH)}, "
        f"{url_soft_score_sql('u', SOFT)} FROM (SELECT ? AS u)"
    )
    for i, u in enumerate(URLS):
        assert got[i] == tuple(con.sql(sql, params=[u]).fetchone()), (u, got[i])


def test_urlmeta_semantics(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)], "i long, u string")
    v = {
        r.i: (r.h, r.p, r.v)
        for r in df.select(
            "i",
            url_host("u").alias("h"),
            url_path("u").alias("p"),
            url_verdict("u", BLOCK, HARD, SOFT, TH).alias("v"),
        ).collect()
    }
    assert v[1] == ("evil-ads.example", "/landing", "domain")
    assert v[2][2] == "domain"        # subdomain
    assert v[3][2] is None            # longer-TLD lookalike passes
    assert v[4][2] == "soft_kw" and v[5][2] is None
    assert v[6][2] == "hard_kw"
    assert v[7] == ("spam.example", "", "domain")   # path-less URL: '' path
    assert v[8] == ("no-scheme.example", "/path", None)
    assert v[9][0] == "spam.example"  # scheme+www canonicalized from upper
    assert v[10] == (None, "", None) and v[11] == (None, None, None)
    assert v[12][0] == "host.example"  # port stripped from host
    assert v[13][2] == "soft_kw"       # repeated keyword occurrences sum
    # bypass vectors all canonicalize to the blocked domain
    assert v[14] == ("evil-ads.example", "/landing", "domain")
    assert v[15][0] == "spam.example" and v[15][2] == "domain"
    assert v[16] == ("evil-ads.example", "/x", "domain")
    assert v[17][0] == "evil-ads.example" and v[17][2] == "domain"

    # precedence: a URL hitting domain AND hard AND soft reports domain
    both = spark.createDataFrame(
        [("https://spam.example/xxx/free-casino-bonus",)], "u string"
    )
    assert (
        both.select(url_verdict("u", BLOCK, HARD, SOFT, TH).alias("v")).first().v
        == "domain"
    )


def test_urlmeta_guards(spark):
    with pytest.raises(ValueError, match="lowercase"):
        url_verdict(F.lit("x"), ["Upper.Example"], [], {}, 1)
    with pytest.raises(ValueError, match="lowercase"):
        url_soft_score(F.lit("x"), {"": 1})
    with pytest.raises(ValueError, match="soft_threshold"):
        url_verdict(F.lit("x"), [], [], {}, 0)
    with pytest.raises(ValueError, match="weight"):
        url_soft_score(F.lit("x"), {"kw": 0})
    with pytest.raises(ValueError, match="lowercase"):
        url_verdict_sql("u", [], ["UPPER"], {}, 1)

    # empty config: everything passes, NULL handling intact
    df = spark.createDataFrame([("https://a.example/b",), (None,)], "u string")
    rows = df.select(
        url_verdict("u", [], [], {}, 1).alias("v"),
        domain_blocked(url_host("u"), []).alias("b"),
    ).collect()
    assert rows[0].v is None and rows[0].b is False
    assert rows[1].v is None and rows[1].b is None
