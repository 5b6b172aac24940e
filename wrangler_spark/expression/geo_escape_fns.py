"""`geo:` and `escape:` EL namespaces.

geo:inFence(lat, lon, geojson) — parity with ``functions/GeoFences.java``
(reference uses an ESRI geometry lib). The fence is a compile-time GeoJSON
literal, so the polygon is parsed on the driver and the even-odd
ray-casting test unrolls into a NATIVE expression over the edges — no
shapely, no UDF, fully codegen'd.

escape: — commons-text StringEscapeUtils surface (escapeCsv/Json/Java/
Html/Xml + unescape) as chained native replaces.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F

from wrangler_spark.errors import ExpressionError
from wrangler_spark.expression.translator import TC


def _rings_from_geojson(doc: str) -> list[list[tuple[float, float]]]:
    """All polygon outer rings in the fence document (a FeatureCollection
    may carry several fences — the point is in-fence if inside ANY,
    GeoFenceTest.java:28-41). Unclosed rings are rejected like the
    reference's IllegalArgumentException (GeoFenceTest.java:55-66)."""
    g = json.loads(doc)
    if g.get("type") == "FeatureCollection":
        geoms = [f["geometry"] for f in g["features"]]
    elif g.get("type") == "Feature":
        geoms = [g["geometry"]]
    else:
        geoms = [g]
    rings = []
    for geom in geoms:
        if geom.get("type") != "Polygon":
            raise ExpressionError("geo:inFence supports Polygon GeoJSON fences")
        ring = [(float(x), float(y)) for x, y in geom["coordinates"][0]]
        if len(ring) < 4 or ring[0] != ring[-1]:
            raise ExpressionError(
                "geo:inFence: polygon ring is not closed (first point must equal last)"
            )
        rings.append(ring)
    return rings


def _in_fence(lat: Column, lon: Column, ring: list[tuple[float, float]]) -> Column:
    """Even-odd ray casting, unrolled per edge (GeoJSON is [lon, lat])."""
    inside = F.lit(False)
    n = len(ring)
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge never crosses the horizontal ray test
        crosses = ((F.lit(yi) > lat) != (F.lit(yj) > lat)) & (
            lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
        )
        inside = F.when(crosses, ~inside).otherwise(inside)
    return inside


def geo_fns():
    def in_fence(tr, a):
        if a[2].lit is None:
            raise ExpressionError("geo:inFence needs a literal GeoJSON fence string")
        rings = _rings_from_geojson(str(a[2].lit))
        lat, lon = a[0].col.cast("double"), a[1].col.cast("double")
        inside = F.lit(False)
        for ring in rings:
            inside = inside | _in_fence(lat, lon, ring)
        return TC(inside, "bool")

    return {"infence": in_fence}


def _chain_replace(c: Column, pairs: list[tuple[str, str]]) -> Column:
    for old, new in pairs:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


_JAVA_ESC = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]
_HTML_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]
_XML_ESC = _HTML_ESC + [("'", "&apos;")]


def escape_fns():
    def escape_csv(tr, a):
        c = a[0].col.cast("string")
        needs = c.contains(",") | c.contains('"') | c.contains("\n")
        quoted = F.concat(F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"'))
        return TC(F.when(needs, quoted).otherwise(c), "str")

    def unescape_csv(tr, a):
        c = a[0].col.cast("string")
        inner = F.replace(F.regexp_replace(c, '^"|"$', ""), F.lit('""'), F.lit('"'))
        return TC(F.when(c.rlike('^".*"$'), inner).otherwise(c), "str")

    def rev(pairs):
        return [(new, old) for old, new in reversed(pairs)]

    return {
        "escapecsv": escape_csv,
        "unescapecsv": unescape_csv,
        "escapejson": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _JAVA_ESC), "str"),
        "unescapejson": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), rev(_JAVA_ESC)), "str"),
        "escapejava": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _JAVA_ESC), "str"),
        "unescapejava": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), rev(_JAVA_ESC)), "str"),
        "escapehtml3": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _HTML_ESC), "str"),
        "escapehtml4": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _HTML_ESC), "str"),
        "unescapehtml3": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), rev(_HTML_ESC)), "str"),
        "unescapehtml4": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), rev(_HTML_ESC)), "str"),
        "escapexml": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _XML_ESC), "str"),
        "escapexml10": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _XML_ESC), "str"),
        "escapexml11": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), _XML_ESC), "str"),
        "unescapexml": lambda tr, a: TC(_chain_replace(a[0].col.cast("string"), rev(_XML_ESC)), "str"),
    }
