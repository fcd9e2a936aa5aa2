"""URL metadata extraction + RefinedWeb-style URL filtering.

Web-corpus pipelines filter documents by their source URL BEFORE
looking at content (RefinedWeb §3.1: a domain blocklist plus
keyword-based URL scoring; the same shape appears in CCNet's and C4's
preprocessing). This module gives the engine that stage as pure
codegen Column expressions:

  - host extraction (scheme-agnostic regexp, lowercased, leading
    ``www.`` stripped — the canonical host form),
  - path extraction,
  - a three-rule verdict: BLOCKED DOMAIN (exact host or any subdomain
    of a blocklisted registrable domain), HARD keyword (any single
    occurrence in the full URL blocks), SOFT keyword score (weighted
    occurrence sum blocks at a threshold). First matching rule wins —
    'domain' > 'hard_kw' > 'soft_kw' > NULL (pass).

Determinism / cross-engine: the extraction regexes live in the
Java-regex ∩ RE2 dialect (no lookaround — the functions/pii.py
discipline) and every rule has a DuckDB SQL builder beside it, so an
oracle can never fork from the engine. NULL url → NULL host/path and
a NULL verdict (no attribution is not a pass — callers decide; the
temperature_mix NULL-stratum discipline).

Scale shape: everything here is a zero-shuffle whole-stage-codegen
scan; blocklists and keyword tables arrive as expression literals
(they are governance config, tens-to-thousands of entries — if a
blocklist ever outgrows literal form, join it BROADCAST on the
extracted host instead).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# host = authority up to the first :, /, ?, or # after an optional
# scheme (Java∩RE2: character classes + alternation only). The PATH
# extraction strips the scheme FIRST (regexp_replace) and only then
# matches — a single optional-scheme pattern would backtrack into the
# no-scheme branch on path-less URLs and return '//host' as the path
# (identically in both engines, but semantically wrong).
# the optional userinfo group ((?:[^/@?#]*@)?) and the trailing-dot
# strip below exist because BOTH are blocklist-bypass vectors:
# 'https://a@evil-ads.example/' would otherwise extract host
# 'a@evil-ads.example' and 'https://evil-ads.example./' host
# 'evil-ads.example.' — neither equals nor suffix-matches the
# blocklisted domain (review catch, verified in both engines)
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_PATH_RE = r"^[^/?#]*(/[^?#]*)"


def url_host(url: Column | str) -> Column:
    """Canonical host: extracted, lowercased, leading 'www.' stripped.
    NULL url → NULL; a URL with no parseable host (empty string) →
    NULL (regexp_extract's no-match '' is normalized to NULL so the
    miss is not a counterfeit host)."""
    c = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    h = F.regexp_replace(h, r"\.+$", "")
    h = F.regexp_replace(h, r"^www\.", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def url_host_sql(expr: str) -> str:
    """DuckDB replay of url_host."""
    h = f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"
    h = f"regexp_replace({h}, '\\.+$', '')"
    h = f"regexp_replace({h}, '^www\\.', '')"
    return f"nullif({h}, '')"


def url_path(url: Column | str) -> Column:
    """Path component ('' when absent, NULL only for NULL url)."""
    c = F.col(url) if isinstance(url, str) else url
    stripped = F.regexp_replace(c, _SCHEME_RE, "")
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.regexp_extract(stripped, _PATH_RE, 1)
    )


def url_path_sql(expr: str) -> str:
    stripped = f"regexp_replace({expr}, '{_SCHEME_RE}', '')"
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"ELSE coalesce(regexp_extract({stripped}, '{_PATH_RE}', 1), '') END"
    )


def _check_terms(terms) -> None:
    for t in terms:
        if not t or t != t.lower():
            raise ValueError(
                f"blocklist/keyword terms must be non-empty lowercase "
                f"(matching is on lowercased text), got {t!r}"
            )


def domain_blocked(host: Column, blocked_domains: list[str]) -> Column:
    """TRUE when the canonical host IS a blocklisted domain or any
    subdomain of one (suffix rule — blocking 'evil.example' must catch
    'tracker.evil.example'); FALSE otherwise; NULL for NULL host."""
    _check_terms(blocked_domains)
    if not blocked_domains:
        return F.when(host.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.lit(False)
        )
    hit = None
    for d in blocked_domains:
        c = (host == d) | host.endswith("." + d)
        hit = c if hit is None else (hit | c)
    return hit


def domain_blocked_sql(host_expr: str, blocked_domains: list[str]) -> str:
    _check_terms(blocked_domains)
    if not blocked_domains:
        return f"CASE WHEN {host_expr} IS NULL THEN NULL ELSE FALSE END"
    return (
        "("
        + " OR ".join(
            f"({host_expr} = {_q(d)} OR suffix({host_expr}, {_q('.' + d)}))"
            for d in blocked_domains
        )
        + ")"
    )


def _q(s: str) -> str:
    """SQL string literal."""
    return "'" + s.replace("'", "''") + "'"


def _soft_score_sql_expr(low_expr: str, soft_keywords: dict[str, int]) -> str:
    """THE soft-score SQL expression — one definition for
    url_verdict_sql and url_soft_score_sql so the scoring formula (and
    its weight guard) can never fork between them."""
    _check_terms(soft_keywords)
    for k, w in soft_keywords.items():
        if w < 1:
            raise ValueError(f"soft keyword weight must be >= 1, got {k}={w}")
    return (
        " + ".join(
            f"{w} * len(regexp_extract_all({low_expr}, {_q(re.escape(k))}))"
            for k, w in sorted(soft_keywords.items())
        )
        or "0"
    )


def url_verdict(
    url: Column | str,
    blocked_domains: list[str],
    hard_keywords: list[str],
    soft_keywords: dict[str, int],
    soft_threshold: int,
) -> Column:
    """The RefinedWeb-style URL verdict over the FULL lowercased url:
    'domain' | 'hard_kw' | 'soft_kw' | NULL (pass). NULL url → NULL.
    Soft score counts every occurrence of each keyword times its
    weight (regexp_count on the literal-escaped keyword)."""
    if soft_threshold < 1:
        raise ValueError(f"soft_threshold must be >= 1, got {soft_threshold}")
    _check_terms(hard_keywords)
    _check_terms(soft_keywords)
    c = F.col(url) if isinstance(url, str) else url
    low = F.lower(c)
    host = url_host(c)
    hard = None
    for k in hard_keywords:
        t = low.contains(k)
        hard = t if hard is None else (hard | t)
    if hard is None:
        hard = F.lit(False)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(F.coalesce(domain_blocked(host, blocked_domains), F.lit(False)), "domain")
        .when(hard, "hard_kw")
        .when(url_soft_score(c, soft_keywords) >= soft_threshold, "soft_kw")
        .otherwise(F.lit(None).cast("string"))
    )


def url_soft_score(url: Column | str, soft_keywords: dict[str, int]) -> Column:
    """Weighted soft-keyword occurrence score over the lowercased url
    (0 for no hits; NULL for NULL url)."""
    _check_terms(soft_keywords)
    c = F.col(url) if isinstance(url, str) else url
    low = F.lower(c)
    score = F.lit(0)
    for k, w in sorted(soft_keywords.items()):
        if w < 1:
            raise ValueError(f"soft keyword weight must be >= 1, got {k}={w}")
        # literal match: escape any regex metacharacters in the keyword
        score = score + F.lit(w) * F.regexp_count(low, F.lit(re.escape(k)))
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(score)


def url_verdict_sql(
    expr: str,
    blocked_domains: list[str],
    hard_keywords: list[str],
    soft_keywords: dict[str, int],
    soft_threshold: int,
) -> str:
    """DuckDB replay of url_verdict (+ url_soft_score as the second
    element — callers embed both from ONE builder so the rule set
    cannot fork)."""
    if soft_threshold < 1:
        raise ValueError(f"soft_threshold must be >= 1, got {soft_threshold}")
    _check_terms(hard_keywords)

    low = f"lower({expr})"
    host = url_host_sql(expr)
    hard = (
        " OR ".join(f"contains({low}, {_q(k)})" for k in hard_keywords)
        if hard_keywords
        else "FALSE"
    )
    score = _soft_score_sql_expr(low, soft_keywords)
    return f"""CASE
  WHEN {expr} IS NULL THEN NULL
  WHEN coalesce({domain_blocked_sql(host, blocked_domains)}, FALSE) THEN 'domain'
  WHEN {hard} THEN 'hard_kw'
  WHEN ({score}) >= {soft_threshold} THEN 'soft_kw'
  ELSE NULL END"""


def url_soft_score_sql(expr: str, soft_keywords: dict[str, int]) -> str:
    score = _soft_score_sql_expr(f"lower({expr})", soft_keywords)
    return f"CASE WHEN {expr} IS NULL THEN NULL ELSE ({score}) END"
