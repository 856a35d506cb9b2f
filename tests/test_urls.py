"""URL canonicalization / domain tier: pure-expression crawl hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.functions.urls import (
    canonicalize_url,
    domain_counts,
    filter_blocked_domains,
    registered_domain,
    url_host,
)


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["c"] for r in df.select(canonicalize_url("u", **kw).alias("c")).collect()]


def test_canonicalize_url_forms(spark):
    got = _canon(
        spark,
        [
            "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/a",
            "https://example.com/a?utm_campaign=z&fbclid=abc",
            "http://h/a?x=1&y=2&gclid=G&z=3",
            "  not a url  ",
            "http://e.com#f",
            "ftp://Mixed.Case/KeepPath",
        ],
    )
    assert got == [
        "https://example.com/Path/?q=1",  # port+tracking+fragment gone, path case kept
        "http://example.com/",
        "http://example.com:8080/a",  # non-default port kept
        "https://example.com/a",  # empty query -> no '?'
        "http://h/a?x=1&y=2&z=3",  # param order preserved
        "not a url",  # pass-through, trimmed
        "http://e.com",
        "ftp://mixed.case/KeepPath",
    ]


def test_canonicalize_trailing_slash_opt_in(spark):
    plain = _canon(spark, ["https://e.com/a/", "https://e.com/"])
    assert plain == ["https://e.com/a/", "https://e.com/"]
    stripped = _canon(
        spark, ["https://e.com/a/", "https://e.com/"], strip_trailing_slash=True
    )
    assert stripped == ["https://e.com/a", "https://e.com/"]  # root slash survives


def test_canonicalize_idempotent(spark):
    urls = [
        "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
        "http://h/a?x=1&y=2&gclid=G&z=3",
        "http://example.com:80/",
    ]
    once = _canon(spark, urls)
    assert _canon(spark, once) == once


def test_registered_domain(spark):
    hosts = [
        "news.bbc.co.uk",
        "a.b.example.com",
        "example.com",
        "localhost",
        "192.168.0.1",
        "Example.COM",
        "shop.com.au",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = [r["d"] for r in df.select(registered_domain("h").alias("d")).collect()]
    assert got == [
        "bbc.co.uk",
        "example.com",
        "example.com",
        "localhost",
        "192.168.0.1",
        "example.com",
        "shop.com.au",  # com.au is itself the suffix pair -> needs 3 labels; 2 stay
    ]


def test_domain_counts_and_blocklist(spark):
    rows = [
        (1, "https://news.bbc.co.uk/story"),
        (2, "https://www.bbc.co.uk/other"),
        (3, "http://spam.evil.com/x"),
        (4, "http://evil.com/y"),
        (5, "https://good.org/z"),
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    counts = {r["domain"]: r["n_docs"] for r in domain_counts(df, "url").collect()}
    assert counts == {"bbc.co.uk": 2, "evil.com": 2, "good.org": 1}

    kept = {r["id"] for r in filter_blocked_domains(df, "url", ["evil.com"]).collect()}
    assert kept == {1, 2, 5}  # subdomain spam.evil.com blocked too
    kept_exact = {
        r["id"]
        for r in filter_blocked_domains(
            df, "url", ["evil.com"], block_subdomains=False
        ).collect()
    }
    assert kept_exact == {1, 2, 3, 5}  # exact-host mode spares the subdomain
    # blocklist as a DataFrame works identically
    bl = spark.createDataFrame([("EVIL.com",)], "domain string")
    assert {
        r["id"] for r in filter_blocked_domains(df, "url", bl).collect()
    } == {1, 2, 5}


def test_url_host_null_for_garbage(spark):
    df = spark.createDataFrame([("nonsense",), ("http://OK.org/a",)], "u string")
    got = [r["h"] for r in df.select(url_host("u").alias("h")).collect()]
    assert got == [None, "ok.org"]


def test_canonicalize_stays_codegen(spark):
    """The whole canonicalization must compile into one projection —
    no Python, no shuffle."""
    df = spark.createDataFrame([("http://a.b/c?utm_a=1",)], "u string")
    plan = (
        df.select(canonicalize_url("u").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_canonicalize_hostile_inputs_total_and_idempotent(spark):
    """Totality on crawl garbage: no exceptions, no nulls introduced,
    and canonicalize(canonicalize(x)) == canonicalize(x) for every
    adversarial shape."""
    hostile = [
        "",
        "   ",
        "://",
        "http://",
        "https://?",
        "a://b#",
        "http://:80/",
        "HTTP://EXAMPLE.COM:80:80/",
        "http://h/p?",
        "http://h/p?&&&",
        "http://h/p?=v&=&utm_source",
        "http://h/p?utm_source",          # tracking param with no '='
        "ftp://UPPER.HOST:443/x",          # 443 on non-https stays
        "http://h#frag#frag2",
        "scheme+weird.thing://Host/Path",
        "not a url at all",
        "häßlich://ünïcode/päth",          # non-ASCII scheme: pass-through
        "http://h/" + "a" * 5000,          # long path
        "http://h/p?q=%%%&utm_x=%%",
        "\thttp://Tabbed.Host/\t",
        "http://h:8080?x=1",               # query with empty path
        "mailto:someone@example.com",      # no ://, pass-through
    ]
    df = spark.createDataFrame([(u,) for u in hostile], "u string")
    once = df.select("u", canonicalize_url("u").alias("c1"))
    rows = once.select(
        "u", "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    assert len(rows) == len(hostile)
    for r in rows:
        assert r["c1"] is not None, r["u"]
        assert r["c2"] == r["c1"], (r["u"], r["c1"], r["c2"])
    by_in = {r["u"]: r["c1"] for r in rows}
    # spot semantics: 443 is only default for https
    assert by_in["ftp://UPPER.HOST:443/x"] == "ftp://upper.host:443/x"
    # non-URL shapes pass through trimmed
    assert by_in["not a url at all"] == "not a url at all"
    assert by_in["mailto:someone@example.com"] == "mailto:someone@example.com"


def test_registered_domain_psl_swap_seam(spark, tmp_path):
    """The multi_suffixes parameter swaps the built-in shortlist for a
    real Public Suffix List: 3-label suffixes take one more label,
    exact-suffix hosts pass through; the plain-rules loader shim keeps
    skipping wildcard/exception rules (load_psl_rules carries them)."""
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        load_public_suffixes,
        registered_domain,
    )

    psl = tmp_path / "psl.dat"
    psl.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"
        "co.uk\n"
        "pvt.k12.ma.us\n"
        "*.ck\n"
        "!www.ck\n"
        "\n"
        "// comment\n"
        "blogspot.com\n"
    )
    suf = load_public_suffixes(str(psl))
    assert suf == ("co.uk", "pvt.k12.ma.us", "blogspot.com")

    df = spark.createDataFrame(
        [
            ("news.bbc.co.uk",),
            ("school.pvt.k12.ma.us",),       # 3-label suffix -> 4 labels
            ("deep.school.pvt.k12.ma.us",),  # still 4 labels
            ("pvt.k12.ma.us",),              # the suffix itself: pass through
            ("myblog.blogspot.com",),        # private-section suffix
            ("a.b.example.com",),
            ("10.1.2.3",),
        ],
        "host string",
    )
    got = [
        r["d"]
        for r in df.select(
            registered_domain("host", multi_suffixes=suf).alias("d")
        ).collect()
    ]
    assert got == [
        "bbc.co.uk",
        "school.pvt.k12.ma.us",
        "school.pvt.k12.ma.us",
        "pvt.k12.ma.us",
        "myblog.blogspot.com",
        "example.com",
        "10.1.2.3",
    ]

    # default shortlist path unchanged
    base = [
        r["d"]
        for r in df.select(registered_domain("host").alias("d")).collect()
    ]
    assert base[0] == "bbc.co.uk" and base[-2] == "example.com"


def test_with_registered_domain_broadcast_path_matches_expression(spark):
    """with_registered_domain (the full-PSL broadcast-join scale path,
    forced by a >64-entry list) must agree with the isin-expression
    form on every host shape, preserve row count and columns, and keep
    no helper columns."""
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        registered_domain,
        with_registered_domain,
    )

    # >64 suffixes forces the join path; include 3- and 4-label rules
    suf = tuple(f"co.x{i}" for i in range(70)) + (
        "co.uk", "pvt.k12.ma.us", "blogspot.com",
    )
    rows = [
        ("news.bbc.co.uk",), ("a.b.example.com",), ("school.pvt.k12.ma.us",),
        ("pvt.k12.ma.us",), ("myblog.blogspot.com",), ("10.1.2.3",),
        ("localhost",), ("x.co.x7",), (None,),
    ]
    df = spark.createDataFrame(rows, "host string")
    joined = with_registered_domain(df, "host", "domain", suf)
    assert joined.columns == ["host", "domain"]
    assert joined.count() == len(rows)
    expr = df.select(
        "host", registered_domain("host", suf).alias("domain")
    )
    key = lambda t: tuple("" if v is None else v for v in t)  # noqa: E731
    assert sorted(map(tuple, joined.collect()), key=key) == sorted(
        map(tuple, expr.collect()), key=key
    )

    # small lists delegate to the pure-expression form (no join)
    small = with_registered_domain(df, "host", "domain", ("co.uk",))
    plan = small._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_registered_domain_psl_wildcard_and_exception_rules(spark, tmp_path):
    """Official publicsuffix.org semantics for the full rule grammar:
    wildcard rules (*.ck) make every single label under the base a
    public suffix, exception rules (!www.ck) override every other
    matching rule, and longest-match is CROSS-CLASS (*.platform.sh
    must beat the coexisting plain platform.sh rule — both are in the
    real list). Expected values are the publicsuffix.org test vectors
    with this repo's null->pass-through convention."""
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        load_psl_rules,
        registered_domain,
    )

    psl = tmp_path / "psl.dat"
    psl.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\nco.uk\n*.ck\n!www.ck\n*.kobe.jp\n!city.kobe.jp\n"
        "platform.sh\n*.platform.sh\n"
    )
    rules = load_psl_rules(str(psl))
    assert rules.plain == ("co.uk", "platform.sh")
    assert rules.wildcards == ("ck", "kobe.jp", "platform.sh")
    assert rules.exceptions == ("www.ck", "city.kobe.jp")

    cases = [
        # publicsuffix.org test_psl.txt, ck zone
        ("test.ck", "test.ck"),            # wildcard suffix itself
        ("b.test.ck", "b.test.ck"),
        ("a.b.test.ck", "b.test.ck"),
        ("www.ck", "www.ck"),              # exception: registrable
        ("www.www.ck", "www.ck"),
        # kobe.jp zone (deep wildcard + deep exception)
        ("kobe.jp", "kobe.jp"),
        ("c.kobe.jp", "c.kobe.jp"),
        ("b.c.kobe.jp", "b.c.kobe.jp"),
        ("a.b.c.kobe.jp", "b.c.kobe.jp"),
        ("city.kobe.jp", "city.kobe.jp"),
        ("www.city.kobe.jp", "city.kobe.jp"),
        # cross-class longest match
        ("foo.platform.sh", "foo.platform.sh"),
        ("a.foo.platform.sh", "a.foo.platform.sh"),
        ("b.a.foo.platform.sh", "a.foo.platform.sh"),
        # plain rules still work beside the specials
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r["d"]
        for r in df.select(
            registered_domain(
                "host", rules.plain, rules.wildcards, rules.exceptions
            ).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_with_registered_domain_specials_match_expression(spark):
    """The broadcast-join scale path honors wildcard/exception rules
    identically to the expression form (specials stay literal — they
    are dozens in the real PSL; only plain rules join)."""
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        registered_domain,
        with_registered_domain,
    )

    plain = tuple(f"co.x{i}" for i in range(70)) + ("co.uk", "platform.sh")
    wilds = ("ck", "kobe.jp", "platform.sh")
    excs = ("www.ck", "city.kobe.jp")
    rows = [
        ("a.b.test.ck",), ("www.www.ck",), ("a.b.c.kobe.jp",),
        ("www.city.kobe.jp",), ("b.a.foo.platform.sh",),
        ("news.bbc.co.uk",), ("a.b.example.com",), ("x.co.x7",),
        ("10.1.2.3",), ("localhost",), (None,),
    ]
    df = spark.createDataFrame(rows, "host string")
    joined = with_registered_domain(df, "host", "domain", plain, wilds, excs)
    assert joined.columns == ["host", "domain"]
    expr = df.select(
        "host",
        registered_domain("host", plain, wilds, excs).alias("domain"),
    )
    key = lambda t: tuple("" if v is None else v for v in t)  # noqa: E731
    assert sorted(map(tuple, joined.collect()), key=key) == sorted(
        map(tuple, expr.collect()), key=key
    )
