"""URL parse/normalize expressions (functions/url.py) — unit behavior
plus a DuckDB cross-engine pin on the shared regex rules (the oracle
for url_domain_curation mirrors them verbatim, so dialect drift between
Java regex and RE2 must surface HERE, not as a driver hash flip)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from sports_stats_data_pipeline_spark.functions.url import (
    TRACKING_PARAM_RE,
    normalize_url,
    registered_domain,
    url_host,
    url_path,
    url_port,
    url_query,
    url_scheme,
)

CASES = [
    # (raw, expected_normalized)
    ("https://Example.COM/a/b?x=1", "https://example.com/a/b?x=1"),
    ("HTTP://WWW.Example.com:80/a", "http://example.com/a"),
    ("https://www.example.com:443/", "https://example.com/"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a?utm_source=f&id=3", "https://example.com/a?id=3"),
    ("https://example.com/a?id=3&utm_a=1&utm_b=2", "https://example.com/a?id=3"),
    ("https://example.com/a?fbclid=xyz", "https://example.com/a"),
    ("https://example.com/a?gclid=1&x=2&utm_c=3", "https://example.com/a?x=2"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?x=1#frag", "https://example.com/a?x=1"),
    ("https://sub.host.co.uk/p?a=1&b=2", "https://sub.host.co.uk/p?a=1&b=2"),
    ("http://example.com", "http://example.com"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_url("u").alias("n")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_component_extractors(spark):
    df = spark.createDataFrame(
        [("HTTPS://User.Host.org:8443/p/q?x=1&y=2#z",)], "u string"
    )
    r = df.select(
        url_scheme("u").alias("s"),
        url_host("u").alias("h"),
        url_port("u").alias("p"),
        url_path("u").alias("pa"),
        url_query("u").alias("q"),
    ).collect()[0]
    assert (r["s"], r["h"], r["p"], r["pa"], r["q"]) == (
        "https", "user.host.org", "8443", "/p/q", "x=1&y=2"
    )


def test_registered_domain(spark):
    cases = {
        "example.com": "example.com",
        "www.example.com": "example.com",
        "a.b.example.com": "example.com",
        "sub.host.co.uk": "host.co.uk",
        "host.co.uk": "host.co.uk",
        "co.uk": "co.uk",
        "localhost": "localhost",
        "news.site.com.au": "site.com.au",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registered_domain("h").alias("d")
        ).collect()
    }
    assert got == cases


def test_tracking_strip_matches_duckdb(spark):
    """The exact two-pass strip the oracle mirrors: Spark regexp_replace
    (implicit global) must equal DuckDB regexp_replace(..., 'g') on a
    query-string corpus covering leading/interior/trailing/only-tracking
    shapes."""
    queries = [
        "id=1",
        "utm_source=a",
        "utm_source=a&id=1",
        "id=1&utm_source=a",
        "id=1&utm_a=1&utm_b=2&x=2",
        "fbclid=abc&gclid=d&id=9",
        "utm_=1&id=2",
        "a=utm_source&b=2",
        "",
        "utm_a=1&utm_b=2",
    ]
    from sports_stats_data_pipeline_spark.functions.url import (
        strip_tracking_params,
    )

    df = spark.createDataFrame([(q,) for q in queries], "q string")
    got = {
        r["q"]: r["s"]
        for r in df.select(
            "q", strip_tracking_params(F.col("q")).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"q": queries}))
    exp = dict(
        con.execute(
            f"""
        SELECT q, regexp_replace(
                 regexp_replace(q, '&{TRACKING_PARAM_RE}=[^&]*', '', 'g'),
                 '^{TRACKING_PARAM_RE}=[^&]*&?', '', 'g') AS s
        FROM t
        """
        ).fetchall()
    )
    assert got == exp
    assert got["id=1&utm_a=1&utm_b=2&x=2"] == "id=1&x=2"
    assert got["utm_a=1&utm_b=2"] == ""
    assert got["a=utm_source&b=2"] == "a=utm_source&b=2"


def test_malformed_urls_normalize_to_null(spark):
    """Unparseable URLs must yield NULL, never a shared constant:
    distinct malformed documents must NOT collide into one group under
    canonical-URL dedup."""
    from sports_stats_data_pipeline_spark.functions.url import (
        registered_domain,
        url_host,
    )

    bad = ["example.com/a", "mailto:x@y.com", "ftp:broken", "", "http//x"]
    df = spark.createDataFrame([(u,) for u in bad], "u string")
    rows = df.select(
        normalize_url("u").alias("n"),
        url_host("u").alias("h"),
        registered_domain(url_host("u")).alias("d"),
    ).collect()
    for r in rows:
        assert r["n"] is None and r["h"] is None and r["d"] is None, r
    # and a well-formed URL still normalizes
    ok = spark.createDataFrame([("https://A.example.com/x",)], "u string")
    assert ok.select(normalize_url("u").alias("n")).collect()[0]["n"] == (
        "https://a.example.com/x"
    )


def test_normalize_idempotent_fuzz(spark):
    """Canonicalization must be a projection: normalize(normalize(u))
    == normalize(u) for component-fuzzed AND junk inputs (a
    non-idempotent rule would make dedup results depend on how many
    times a URL passed through the pipeline)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text("abcwXYZ09-", min_size=1, max_size=6)
    param = st.sampled_from(
        ["id=1", "utm_source=a", "fbclid=z", "a=b", "x="]
    )
    built = st.builds(
        lambda sch, host, port, path, params, frag: (
            f"{sch}://{host}{port}/{path}"
            + ("?" + "&".join(params) if params else "")
            + frag
        ),
        st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        st.builds(
            lambda a, b, www: www + f"{a}.{b}.com",
            label, label,
            st.sampled_from(["", "WWW.", "www.www.", "www."]),
        ),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        label,
        st.lists(param, max_size=4),
        st.sampled_from(["", "#frag", "#"]),
    )
    junk = st.text(max_size=20)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.one_of(built, junk), min_size=1, max_size=80))
    def check(urls):
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        once = df.select(normalize_url("u").alias("n"))
        twice = once.select(
            F.col("n").alias("orig"), normalize_url("n").alias("n2")
        ).collect()
        for r in twice:
            assert r["n2"] == r["orig"], (r["orig"], r["n2"])

    check()


def test_www_stripping_idempotent_cases(spark):
    """All leading www. labels strip at once; a www-only host is
    malformed (NULL) — both required for normalize to be a projection."""
    cases = {
        "http://www.example.com/a": "http://example.com/a",
        "http://www.www.example.com/a": "http://example.com/a",
        "http://WWW.WWW.example.com/a": "http://example.com/a",
        "http://www./a": None,
        "http://www.www./a": None,
        "http://www.": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["n"]
        for r in df.select("u", normalize_url("u").alias("n")).collect()
    }
    assert got == cases


def test_url_domain_curation_hostile_source_values(spark, tmp_path):
    """The driver slot synthesizes hosts from documents.source; a
    regenerated corpus may carry source values that are not
    hostname-safe. The sanitize-to-[a-z0-9-] fold (empty/NULL -> 'src')
    must keep Spark and DuckDB hash-identical on adversarial inputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sports_stats_data_pipeline_spark.plans import all_registries
    from ._compare import assert_frames_match

    hostile = [
        "Feed One",          # space + case
        "src_9",             # underscore
        "a/b?c#d",           # URL metacharacters
        "",                  # empty -> 'src'
        None,                # NULL -> 'src'
        "UPPER.CASE",        # dots (would fake subdomains) + case
        "café-π",            # non-ASCII
        "ok-src7",           # already clean
    ]
    n = 64
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array([hostile[i % len(hostile)] for i in range(n)]),
            "n_chars": pa.array([2] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    import duckdb

    reg = all_registries()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    spark_pdf = reg.queries["url_domain_curation"](
        spark, str(tmp_path)
    ).toPandas()
    oracle_pdf = con.execute(reg.oracles["url_domain_curation"]).df()
    con.close()
    assert len(spark_pdf) == n
    # hosts derived from hostile sources are still valid-looking labels
    assert spark_pdf["host"].str.match(r"^[a-z0-9.:-]+$").all()
    assert_frames_match(spark_pdf, oracle_pdf, "url_domain_curation_hostile")


def test_userinfo_stripped_from_host_and_normalization(spark):
    """A userinfo component must not split an origin: url_host drops a
    leading 'user[:pw]@' from the authority, so per-domain stats and
    canonical-URL dedup bucket 'https://user@example.com/x' with
    'https://example.com/x' (round-6 ADVICE fix). Port parsing is
    unaffected (the port regex anchors at the authority's end)."""
    rows = [
        ("https://user@Example.com/x", "example.com", "https://example.com/x"),
        ("http://u:pw@WWW.example.com:80/a", "www.example.com",
         "http://example.com/a"),  # url_host keeps www.; normalize strips
        ("https://u@sub.host.co.uk:8443/p?a=1", "sub.host.co.uk",
         "https://sub.host.co.uk:8443/p?a=1"),
        ("https://example.com/has@sign", "example.com",
         "https://example.com/has@sign"),  # '@' in path is NOT userinfo
        # unencoded '@' in the password: WHATWG splits at the LAST '@'
        ("http://user:p@ss@example.com/a", "example.com",
         "http://example.com/a"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(rows)], "i long, u string"
    )
    got = {
        r["i"]: (r["h"], r["n"], r["d"])
        for r in df.select(
            "i",
            url_host("u").alias("h"),
            normalize_url("u").alias("n"),
            registered_domain(url_host("u")).alias("d"),
        ).collect()
    }
    for i, (u, host, norm) in enumerate(rows):
        assert got[i][0] == host, (u, got[i])
        assert got[i][1] == norm, (u, got[i])
    assert got[0][2] == "example.com"
    # port survives userinfo: u@host:8443 -> 8443
    p = (
        spark.createDataFrame([("https://u@h.org:8443/",)], "u string")
        .select(url_port("u").alias("p"))
        .collect()[0]["p"]
    )
    assert p == "8443"
