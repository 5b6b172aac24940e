"""URL canonicalization — the web-corpus dedup key primitive.

Common Crawl-style pipelines dedup and cap by URL before any content
hashing: the same page is fetched as ``http://WWW.Example.com/a/?utm_
source=x`` and ``https://example.com/a``, and a raw string key treats
those as different documents. ``normalize_urls`` applies the standard
canonicalization (RFC 3986 syntax normalization plus the conventional
dedup-key extras) entirely in native Column expressions — scan-side,
zero shuffle, composable with exact_dedup / sample_domain_cap /
url_host as the key column.

Steps (each is the common public convention, documented where it goes
beyond RFC 3986 syntax normalization):
- scheme and host lowercased (RFC 3986 §6.2.2.1); path/query untouched
  (case-significant)
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped (never sent to the server)
- leading ``www.`` dropped (dedup-key convention; disable with
  ``strip_www=False``)
- tracking parameters removed: ``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_eid``, ``igshid`` — the standard click-id/campaign
  set; extend with ``drop_params``
- remaining query parameters SORTED (param order is almost never
  significant; documented divergence for the servers where it is)
- empty path becomes ``/``; a trailing slash on a non-root path is
  stripped (dedup-key convention)
- anything that doesn't parse as ``scheme://authority...`` → NULL
  (not a URL is not a key)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the conventional tracking/click-id parameter names (campaign tags and
# per-click identifiers that never change page content)
TRACKING_PARAMS = ("utm_[a-z0-9]+", "gclid", "fbclid", "msclkid", "mc_eid", "igshid")

_SCHEME_RE = r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\?([^#]*)"


def normalize_url_expr(
    url: Column, strip_www: bool = True,
    drop_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """The canonical-URL Column expression (see module docstring).
    Pure scan-side; NULL for non-URLs."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    host = F.regexp_replace(auth, r":\d+$", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    authority = F.when(
        (port == "") | default_port, host
    ).otherwise(F.concat(host, F.lit(":"), port))

    # sorted, tracking-stripped query (empty params from '&&' dropped)
    tracking = "^(" + "|".join(drop_params) + ")(=.*)?$"

    def _keep(p):
        return (p != "") & ~p.rlike(tracking)

    params = F.array_sort(F.filter(F.split(query, "&"), _keep))
    qjoined = F.array_join(params, "&")

    npath = F.regexp_replace(path, r"/+$", "")
    npath = F.when(npath == "", F.lit("/")).otherwise(npath)

    out = F.concat(
        scheme, F.lit("://"), authority, npath,
        F.when(qjoined == "", F.lit("")).otherwise(F.concat(F.lit("?"), qjoined)),
    )
    return F.when((scheme == "") | (host == ""), F.lit(None).cast("string")).otherwise(out)


def normalize_urls(
    df: DataFrame, url_col: str, out_col: str = "url_norm",
    strip_www: bool = True, drop_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Append the canonical form of ``url_col`` as ``out_col`` — the
    dedup/cap key for web corpora. Scan-side projection, zero shuffle;
    compose downstream: ``exact`` URL dedup is dropDuplicates on the
    key, per-site caps are sample_domain_cap on the key's host."""
    return df.withColumn(
        out_col, normalize_url_expr(F.col(url_col), strip_www, drop_params)
    )
