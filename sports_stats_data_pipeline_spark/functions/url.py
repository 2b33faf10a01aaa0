"""URL parsing / normalization column expressions.

A large-scale web-data pipeline keys almost everything on the URL:
exact dedup by canonical URL (C4/CCNet-style), per-domain quotas and
quality stats (RefinedWeb), and source attribution. These are the
standard canonicalization rules expressed as pure built-in column
expressions — JVM-side, codegen-friendly, no Python in the hot path —
and every regex is written in the common subset of Java regex (Spark)
and RE2 (DuckDB): no lookarounds, no back-references in patterns, and
no ``$1``/``\\1`` group substitutions (the two engines spell those
differently), so the DuckDB oracle can mirror each rule verbatim.

Normalization contract (:func:`normalize_url`):
- scheme and host lowercased;
- ALL leading ``www.`` labels stripped from the host (all, not one:
  stripping one would make ``www.www.example.com`` normalize
  differently on a second pass — canonicalization must be a
  projection); a host that is NOTHING BUT ``www.`` labels is
  malformed and normalizes to NULL;
- default ports dropped (``:80`` for http, ``:443`` for https; other
  ports kept);
- the fragment dropped;
- tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``), with
  separator cleanup so the surviving query string is well-formed;
- a trailing ``?`` dropped when the query ends up empty.

Deliberately NOT done (documented, contested-territory rules):
trailing-slash folding, percent-encoding case normalization, and query
parameter re-ordering — all change semantics for some origins.

:func:`registered_domain` is the naive public-suffix rule (last two
labels, or three when the last two are a known multi-label suffix such
as ``co.uk``). A production deployment swaps in the full public-suffix
list as a broadcast join; the operator shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters removed by normalize_url (regex alternation).
TRACKING_PARAM_RE = "(utm_[A-Za-z0-9_]*|fbclid|gclid)"

#: multi-label public suffixes the naive registered-domain rule knows.
MULTI_LABEL_SUFFIXES = ("co.uk", "com.au", "co.jp", "co.in", "com.br")

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATHQ_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def url_hostport(url: Column | str) -> Column:
    """Raw authority component (original case) — may still carry a
    leading ``userinfo@``; :func:`url_host` strips it."""
    return F.regexp_extract(_c(url), _HOSTPORT_RE, 1)


def url_host(url: Column | str) -> Column:
    """Lowercased host with any leading ``userinfo@`` and trailing
    ``:port`` removed (``www.`` kept — stripping it is a normalization
    choice, see :func:`normalize_url`). The userinfo strip keeps
    ``https://user@example.com/x`` in the same origin bucket as
    ``https://example.com/x`` — without it, per-domain stats and
    canonical-URL dedup would split one origin into two. The strip
    cuts at the LAST ``@`` (the WHATWG rule: ``user:p@ss@host`` hosts
    at ``host`` — an unencoded ``@`` in the password is the common
    real-world shape), which the greedy ``^[^/?#]*@`` gives since the
    authority already contains no ``/?#``; the pattern is in the
    Java-regex/RE2 common subset. NULL when
    the URL has no parseable ``scheme://authority`` — an empty-string
    host would otherwise collect every malformed URL into one
    per-domain stats bucket."""
    auth = F.regexp_replace(url_hostport(url), "^[^/?#]*@", "")
    h = F.lower(F.regexp_replace(auth, ":[0-9]+$", ""))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def url_port(url: Column | str) -> Column:
    """Port digits as a string ('' when absent)."""
    return F.regexp_extract(url_hostport(url), ":([0-9]+)$", 1)


def url_path_query(url: Column | str) -> Column:
    """Path plus query (``/a/b?x=1``), fragment excluded."""
    return F.regexp_extract(_c(url), _PATHQ_RE, 1)


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(url_path_query(url), "^([^?]*)", 1)


def url_query(url: Column | str) -> Column:
    """Query string after ``?`` ('' when absent)."""
    return F.regexp_extract(url_path_query(url), "\\?(.*)$", 1)


def strip_tracking_params(query: Column) -> Column:
    """Remove tracking params from a query STRING (not a full URL).

    Two passes, no group substitutions (engine-portable): the first
    removes every ``&``-prefixed tracking param (interior/trailing),
    which leaves at most one tracking param in leading position; the
    second removes that one together with its trailing ``&``."""
    q1 = F.regexp_replace(
        query, "&" + TRACKING_PARAM_RE + "=[^&]*", ""
    )
    return F.regexp_replace(q1, "^" + TRACKING_PARAM_RE + "=[^&]*&?", "")


def normalize_url(url: Column | str) -> Column:
    """Canonical URL per the module-docstring contract. NULL when the
    URL has no parseable ``scheme://authority``: every component regex
    returns '' on no match, so without the guard all malformed inputs
    (scheme-less hosts, mailto:, plain garbage) would canonicalize to
    the SAME constant ``'://'`` and collide into one group under
    canonical-URL dedup — silently dropping distinct documents."""
    u = _c(url)
    scheme = url_scheme(u)
    host = F.regexp_replace(url_host(u), "^(www\\.)+", "")
    port = url_port(u)
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    query = strip_tracking_params(url_query(u))
    querypart = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )
    return F.when(
        (scheme == "") | host.isNull() | (host == ""),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), host, portpart, url_path(u), querypart
        )
    )


def registered_domain(host: Column | str) -> Column:
    """Naive public-suffix registered domain of a (lowercased) host:
    last two labels, or three when the trailing two form a known
    multi-label suffix (:data:`MULTI_LABEL_SUFFIXES`)."""
    h = _c(host)
    labels = F.split(h, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    # explicit NULL guard: concat_ws('' on NULL input) would otherwise
    # turn a NULL host into the empty string, merging all malformed
    # rows into one domain bucket
    return F.when(h.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n <= 2, h).otherwise(
            F.when(is_multi, last3).otherwise(last2)
        )
    )
