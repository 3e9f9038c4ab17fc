"""URL canonicalization and host/domain functions — pure Spark column
expressions (JVM codegen, zero Python), the normalization layer every
Common-Crawl-scale pipeline needs before URL-keyed dedup, host rollup
(``pipeline/hostgraph.py``), or frontier scheduling.

Canonicalization contract (RFC 3986 §6 normalization subset + the
standard search-engine conventions; each rule is deterministic and
documented so the DuckDB oracle can replicate it independently):

1. trim surrounding whitespace
2. lowercase the scheme and the host (path/query stay case-sensitive)
3. strip the default port (``:80`` for http, ``:443`` for https);
   non-default ports are kept
4. drop the fragment (``#…`` never reaches the server)
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``), sort the survivors byte-wise, drop the ``?`` when
   nothing survives
6. empty path → ``/`` (``http://a.com`` ≡ ``http://a.com/``)

Strings without a ``scheme://`` authority are returned trimmed but
otherwise untouched (un-canonicalizable — relative refs, mailto:,
garbage); filter with :func:`is_http_url` first when that matters.

``registered_domain`` implements the public-suffix idiom with a built-
in "lite" list of the common two-level suffixes (co.uk, com.au, …).
The real PSL is ~9k rules and updates monthly — at cluster scale pass
``extra_suffixes`` with the full list; the plan shape (one
``array_contains`` against a literal array, still codegen) is
unchanged.

All helpers take a Column OR a column name and return a Column, so
they compose in ``select``/``withColumn`` like the builtins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: full-URL split: scheme :// authority path ?query #fragment
_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
#: query params dropped by canonical_url (click-tracking noise)
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid)="
#: two-level public suffixes the "lite" registered_domain knows about
PUBLIC_SUFFIXES_2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "co.kr", "or.kr", "co.za",
    "com.sg", "com.hk", "com.tw",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _part(url: Column, group: int) -> Column:
    return F.regexp_extract(url, _URL_RE, group)


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme, '' when the string has no ``scheme://``."""
    return F.lower(_part(F.trim(_col(url)), 1))


def url_host(url: Column | str) -> Column:
    """Lowercased host without the port, '' when unparsable."""
    auth = _part(F.trim(_col(url)), 2)
    return F.lower(F.regexp_replace(auth, r":\d+$", ""))


def url_port(url: Column | str) -> Column:
    """Explicit port as a string ('' when absent)."""
    auth = _part(F.trim(_col(url)), 2)
    return F.regexp_extract(auth, r":(\d+)$", 1)


def url_path(url: Column | str) -> Column:
    """Path as written (case preserved); '' when absent."""
    return _part(F.trim(_col(url)), 3)


def url_query(url: Column | str) -> Column:
    """Raw query string without the '?' ('' when absent)."""
    return _part(F.trim(_col(url)), 4)


def is_http_url(url: Column | str) -> Column:
    """True when the string parses as an absolute http(s) URL."""
    return url_scheme(url).isin("http", "https")


def url_depth(url: Column | str) -> Column:
    """Number of non-empty path segments (int; 0 for root)."""
    segs = F.filter(F.split(url_path(url), "/"), lambda x: x != "")
    return F.size(segs)


def canonical_query(url: Column | str) -> Column:
    """Tracking params dropped, survivors byte-sorted, '&'-joined."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def canonical_url(url: Column | str) -> Column:
    """The canonicalization contract from the module docstring, as one
    codegen-able expression tree."""
    u = F.trim(_col(url))
    scheme = F.lower(_part(u, 1))
    host = F.lower(F.regexp_replace(_part(u, 2), r":\d+$", ""))
    port = F.regexp_extract(_part(u, 2), r":(\d+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = _part(u, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = canonical_query(u)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    # no scheme://authority → return the trimmed input unchanged
    return F.when(_part(u, 1) == "", u).otherwise(canon)


def surt_key(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the CDX-
    index form web archives sort and range-scan by: host labels
    reversed and comma-joined, scheme dropped, then ``)`` + the
    canonicalized path and query (same rules as :func:`canonical_url`:
    default ports dropped, non-default kept, tracking params removed,
    params byte-sorted, fragment dropped, empty path → ``/``).

    ``https://www.Example.com/a?b=2&a=1`` → ``com,example,www)/a?a=1&b=2``

    Prefix-scanning a SURT-sorted table by ``com,example,`` retrieves
    every subdomain of example.com — the reason archives key on it.
    Unparsable strings return ''."""
    u = F.trim(_col(url))
    scheme = F.lower(_part(u, 1))
    host = F.lower(F.regexp_replace(_part(u, 2), r":\d+$", ""))
    port = F.regexp_extract(_part(u, 2), r":(\d+)$", 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = _part(u, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = canonical_query(u)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(_part(u, 1) == "", F.lit("")).otherwise(
        F.concat(rev_host, port_part, F.lit(")"), path, q_part)
    )


def registered_domain(
    url_or_host: Column | str, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable domain (eTLD+1) of a URL or bare host, using the
    built-in lite suffix list plus ``extra_suffixes``. A bare host (no
    ``scheme://``) is accepted directly. '' when there is no dot."""
    raw = F.trim(_col(url_or_host))
    host = F.when(_part(raw, 1) == "", F.lower(raw)).otherwise(url_host(raw))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffixes = F.lit(list(PUBLIC_SUFFIXES_2 + tuple(extra_suffixes)))
    return (
        F.when(n < 2, F.lit(""))
        .when((n >= 3) & F.array_contains(suffixes, last2), last3)
        .otherwise(last2)
    )
