"""URL canonicalization — the CommonCrawl-style pre-dedup step.

Web-scale corpora dedup BY URL before they dedup by content; for that
the URL must be canonical: scheme/host case, default ports, fragments,
tracking parameters, parameter order, and trailing slashes must not
create distinct keys for the same resource. Everything here is a pure
Column expression (parse_url + string/array functions, whole-stage
codegen) — at 100 TB this runs map-side at scan speed, no UDF, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# query parameters that never identify a resource (ad/campaign tracking)
TRACKING_PARAMS_RE = (
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid)="
)

# second-level labels that act like TLDs under a 2-letter country code
# (a deliberately compact public-suffix heuristic — a deployment wires
# in the full PSL as a broadcast lookup; the shape of the expression is
# identical)
_SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")


def _authority(u: Column) -> Column:
    # parse_url(HOST) drops the port; recover it from AUTHORITY so the
    # default-port rule can act on it
    return F.parse_url(u, F.lit("AUTHORITY"))


def url_host(u: Column) -> Column:
    """Lowercased host without port."""
    return F.lower(F.parse_url(u, F.lit("HOST")))


def canonical_url(u: Column) -> Column:
    """The canonical form: lowercase scheme+host, default ports and
    fragments stripped, tracking params dropped, remaining params
    sorted, trailing path slashes removed (root path collapses to
    none)."""
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = url_host(u)
    port = F.regexp_extract(_authority(u), r":(\d+)$", 1)
    is_default = (
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), r"/+$", "")
    q = F.parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(q, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS_RE),
        )
    )
    q_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(proto, F.lit("://"), host, port_part, path, q_part)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the compact suffix heuristic: two labels, or three
    when the second-to-last label is a known second-level under a
    2-letter ccTLD (news.co.uk, not co.uk)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    tld = F.element_at(parts, -1)
    sld = F.element_at(parts, -2)
    three = (
        (n >= 3)
        & (F.length(tld) == 2)
        & sld.isin(*_SECOND_LEVEL)
    )
    two_join = F.concat_ws(".", F.slice(parts, n - 1, 2))
    three_join = F.concat_ws(".", F.slice(parts, n - 2, 3))
    return (
        F.when(three, three_join)
        .when(n >= 2, two_join)
        .otherwise(host)  # bare hosts (localhost) are their own domain
    )
