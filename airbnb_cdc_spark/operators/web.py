"""URL canonicalization + domain extraction — the web-corpus pipeline
stage every large crawl dedup runs before content hashing: the same
page is crawled as ``HTTP://WWW.Site.com/a/?utm_source=x#frag`` and
``http://site.com/a``, and exact-URL dedup without canonicalization
keeps both (then wastes a full content-dedup pass discovering they are
identical).

Everything is built-in Catalyst string/array expressions — split_part,
lower, filter/sort_array over the query params — so the whole
canonicalization runs inside whole-stage codegen at scan speed (zero
Python, SURVEY.md §2.9 stance; the reference has no web stage — this
is part of the LLM-training-data surface, like operators/dedup.py).
At 100 TB the operator is a pure per-row projection: no shuffle, no
state, safe to fuse into any scan.

Canonical form (for absolute http(s) URLs):
- scheme and host lowercased; a leading ``www.`` dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- the ``#fragment`` dropped (never sent to the server)
- tracking params removed (``utm_*`` prefixes + the exact params in
  ``TRACKING_PARAMS``), remaining params sorted bytewise so param
  order never splits a URL identity
- a single trailing slash dropped from the path (``/a/`` = ``/a``,
  root ``/`` = empty)

Path case is preserved (paths are case-sensitive per RFC 3986; hosts
are not). The DuckDB oracles for the driver queries validate the whole
pipeline against PLANTED ground truth: the query builds URLs whose
canonical form is known analytically, and the oracle states that form
directly — an independent derivation, not a SQL re-implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# utm_* covers source/medium/campaign/term/content/id; the exact names
# are the common click-id / referrer params.
TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)
TRACKING_PARAMS: tuple[str, ...] = ("gclid", "fbclid", "msclkid", "ref")


def _is_tracking(p: Column) -> Column:
    cond = None
    for pre in TRACKING_PREFIXES:
        c = F.startswith(p, F.lit(pre))
        cond = c if cond is None else (cond | c)
    for name in TRACKING_PARAMS:
        c = F.startswith(p, F.lit(f"{name}=")) | (p == F.lit(name))
        cond = c if cond is None else (cond | c)
    return cond


def canonicalize_url(url: Column) -> Column:
    """The canonical form of an absolute http(s) URL (module
    docstring). NULL in → NULL out; a URL without ``://`` degrades to
    ``scheme://`` of its lowercased whole (garbage in, stable garbage
    out — canonicalization must never throw mid-scan at 100 TB)."""
    u = F.trim(url)
    nofrag = F.split_part(u, F.lit("#"), F.lit(1))
    base = F.split_part(nofrag, F.lit("?"), F.lit(1))
    q = F.split_part(nofrag, F.lit("?"), F.lit(2))

    scheme = F.lower(F.split_part(base, F.lit("://"), F.lit(1)))
    hostpath = F.split_part(base, F.lit("://"), F.lit(2))
    rawhost = F.split_part(hostpath, F.lit("/"), F.lit(1))
    # 2-arg substring (pos to end) exists only in the SQL registry;
    # the PySpark wrapper demands a length.
    path = F.call_function(
        "substring", hostpath, F.length(rawhost) + F.lit(1)
    )

    host = F.lower(rawhost)
    host = (
        F.when(
            (scheme == "http") & F.endswith(host, F.lit(":80")),
            F.left(host, F.length(host) - F.lit(3)),
        )
        .when(
            (scheme == "https") & F.endswith(host, F.lit(":443")),
            F.left(host, F.length(host) - F.lit(4)),
        )
        .otherwise(host)
    )
    host = F.when(
        F.startswith(host, F.lit("www.")),
        F.call_function("substring", host, F.lit(5)),
    ).otherwise(host)

    path = (
        F.when(path == "/", F.lit(""))
        .when(
            F.endswith(path, F.lit("/")), F.left(path, F.length(path) - F.lit(1))
        )
        .otherwise(path)
    )

    kept = F.when(q == "", F.lit("")).otherwise(
        F.array_join(
            F.sort_array(F.filter(F.split(q, "&"), lambda p: ~_is_tracking(p))),
            "&",
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def url_domain(canonical_url: Column) -> Column:
    """Host part of an already-canonical URL (``canonicalize_url``
    output: host ends at the first ``/`` or ``?``)."""
    return F.split_part(
        F.split_part(
            F.split_part(canonical_url, F.lit("://"), F.lit(2)),
            F.lit("/"),
            F.lit(1),
        ),
        F.lit("?"),
        F.lit(1),
    )


def url_dedup(
    df, url_col: str, id_col: str, canonical_col: str = "canonical_url"
):
    """Exact dedup on the CANONICAL URL: one row per canonical form,
    keeping the minimum ``id_col`` (first-crawled wins under a
    monotonic id), plus variant counts. One hash groupBy — the same
    single-shuffle shape as exact content dedup (dedup.py), applied
    before it so content hashing never reads a page twice."""
    canon = df.withColumn(canonical_col, canonicalize_url(F.col(url_col)))
    return canon.groupBy(canonical_col).agg(
        F.min(id_col).alias(f"keeper_{id_col}"),
        F.count(F.lit(1)).alias("n_variants"),
        F.countDistinct(url_col).alias("n_distinct_raw"),
    )


def domain_suffixes(domain: Column) -> Column:
    """All dot-suffix levels of a host: ``a.b.example.com`` →
    ``[a.b.example.com, b.example.com, example.com, com]``. Bounded by
    label depth (~5 for real hosts), so the explode it feeds is a
    constant fan-out, not a corpus blow-up."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def blocklist_filter(
    df,
    url_col: str,
    rules,
    id_col: str = "doc_id",
):
    """Drop rows whose URL's host matches a blocklist entry exactly OR
    as a dot-suffix (the UT1/registry convention: a rule
    ``example.com`` blocks every subdomain). Built for million-rule
    lists: the host explodes into its ≤depth suffix levels (constant
    fan-out) and equality-joins the BROADCAST rule table — never a
    per-row scan of the rules, never a theta join; blocked ids then
    anti-join the corpus. Returns the surviving rows with the
    canonical domain attached."""
    canon = df.withColumn("__canon", canonicalize_url(F.col(url_col)))
    domained = canon.withColumn("domain", url_domain(F.col("__canon")))
    blocked = (
        domained.select(
            id_col,
            F.explode(domain_suffixes(F.col("domain"))).alias("__sfx"),
        )
        .join(
            F.broadcast(rules.select(F.col(rules.columns[0]).alias("__sfx"))),
            "__sfx",
        )
        .select(id_col)
        .distinct()
    )
    return domained.join(blocked, id_col, "left_anti").drop("__canon")
