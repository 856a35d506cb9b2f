"""URL canonicalization and domain analytics (crawl-curation tier).

Web-scale training corpora are organized by URL: dedup keys, per-domain
quotas, blocklists, and provenance all start from a CANONICAL url —
raw crawl URLs differ in case, tracking parameters, fragments, and
default ports while naming the same resource (the C4 / RefinedWeb /
CCNet pipelines all canonicalize before URL-level dedup). Everything
here is a pure Column expression — whole-stage codegen, no Python —
so canonicalization runs at scan speed over 100 TB of WARC metadata.

Limits, stated honestly: `registered_domain` approximates the Public
Suffix List with the common multi-label suffixes below; a production
deployment should swap in the full PSL (a ~10k-entry broadcast map)
at the marked seam. Userinfo (`user:pass@host`) is lowercased along
with the host — crawl URLs do not carry credentials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Parameters that track the click, not the resource (Google/Facebook/
# Microsoft/Mailchimp/Instagram/HubSpot ad+campaign tags).
TRACKING_PARAMS = (
    "utm_[^=&]*",
    "fbclid",
    "gclid",
    "gclsrc",
    "dclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref_src",
    "ref_url",
    "_hsenc",
    "_hsmi",
)

# Common second-level public suffixes: "<label>.<tld>" pairs under
# which registrations happen one level deeper (bbc.co.uk -> bbc).
# Swap for the full Public Suffix List in production (the seam:
# _MULTI_SUFFIXES just feeds an isin()).
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "co.kr", "co.in", "co.nz", "co.za", "co.id",
    "com.br", "com.mx", "com.ar", "com.cn", "com.tw",
    "com.sg", "com.hk", "com.tr",
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"


def url_host(url: Column | str) -> Column:
    """Lowercased host, NULL for non-URLs. `parse_url` is Spark's
    built-in (Hive-compatible) URL parser — JVM-side."""
    return F.lower(
        F.parse_url(F.col(url) if isinstance(url, str) else url, F.lit("HOST"))
    )


def url_path(url: Column | str) -> Column:
    return F.parse_url(F.col(url) if isinstance(url, str) else url, F.lit("PATH"))


def canonicalize_url(
    url: Column | str,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
    strip_trailing_slash: bool = False,
) -> Column:
    """One canonical form per resource:

    - trim surrounding whitespace, drop the fragment (`#...`)
    - lowercase scheme and authority
    - drop default ports (`:80` for http, `:443` for https)
    - drop tracking query parameters (regex alternatives in
      ``tracking_params``), preserving the order of the rest
    - drop a now-empty `?`
    - optionally strip one trailing slash from a non-root path

    Strings that don't parse as absolute URLs pass through trimmed —
    the expression stays total (no nulls introduced).
    """
    c = F.trim(F.col(url) if isinstance(url, str) else url)
    c = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(c, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(c, _URL_RE, 2))
    rest = F.regexp_extract(c, _URL_RE, 3)

    # (:80)+ not :80 — a malformed ":80:80" authority must still reach
    # a fixed point in one pass (idempotence is pinned in tests)
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r"(:80)+$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r"(:443)+$", ""))
        .otherwise(auth)
    )

    path = F.substring_index(rest, "?", 1)
    if strip_trailing_slash:
        path = F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.regexp_replace(path, r"/$", ""),
        ).otherwise(path)

    # query = everything after the first '?' (empty when absent)
    query = F.when(
        rest.contains("?"),
        F.substring(
            rest,
            F.length(F.substring_index(rest, "?", 1)) + 2,
            F.length(rest),
        ),
    ).otherwise(F.lit(""))
    drop_re = "^(" + "|".join(tracking_params) + ")(=.*)?$"
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(drop_re),
    )
    query = F.array_join(kept, "&")

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(F.length(query) > 0, F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(c)


def registered_domain(host: Column | str) -> Column:
    """The registrable domain of a host: last two labels, or last
    THREE when the last two are a known multi-label public suffix
    (news.bbc.co.uk -> bbc.co.uk, a.b.example.com -> example.com).
    Hosts with fewer labels (and IPv4 literals) pass through
    unchanged. PSL approximation — see module docstring."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    is_ip = h.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(is_ip | (n <= 2), h)
        .when(last2.isin(*_MULTI_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_counts(df: DataFrame, url_col: str) -> DataFrame:
    """Docs per registered domain, descending — the corpus-shape
    report behind per-domain quotas. One groupBy on the domain key
    (far coarser than URLs). Output: (domain, n_docs)."""
    return (
        df.select(registered_domain(url_host(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("domain"))
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | list[str],
    block_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL's registered domain is blocklisted — the
    standard crawl hygiene gate. ``blocked`` is a one-column DataFrame
    or list of domains; the anti-join side is blocklist-sized, so the
    optimizer broadcasts it on its own. With ``block_subdomains`` the
    match is on the registered domain (evil.com blocks www.evil.com);
    without, on the exact host."""
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame([(d,) for d in blocked], "domain string")
    key = (
        registered_domain(url_host(url_col))
        if block_subdomains
        else url_host(url_col)
    )
    bl = blocked.select(F.lower(F.col(blocked.columns[0])).alias("__blocked_domain"))
    return (
        df.withColumn("__domain", key)
        .join(bl, F.col("__domain") == F.col("__blocked_domain"), "left_anti")
        .drop("__domain")
    )
