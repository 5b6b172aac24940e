"""HTML outlink extraction: href forms, scheme filtering, relative
resolution against the page origin, host-graph reduction, and the
composition into graph_pagerank (crawl-frontier ranking)."""

from pyspark.sql import functions as F

from wrangler_spark.datapipe.text import extract_links


def _page(links):
    return "<html><body>" + "".join(
        f'<a href="{u}">x</a>' for u in links) + "</body></html>"


def test_href_forms_and_filters(spark):
    html = ("<a href=\"https://a.com/p#frag\">1</a>"
            "<a href='http://b.org/q'>2</a>"
            "<a href = \"https://c.net\">3</a>"
            "<A HREF=\"HTTPS://D.IO/R\">4</A>"
            "<a href=\"mailto:x@y.z\">m</a>"
            "<a href=\"javascript:void(0)\">j</a>"
            "<a href=\"tel:+123\">t</a>"
            "<a href=\"#top\">f</a>")
    df = spark.createDataFrame([(1, html)], "id long, h string")
    urls = {r["url"] for r in extract_links(df, "id", "h").collect()}
    assert urls == {"https://a.com/p", "http://b.org/q",
                    "https://c.net", "HTTPS://D.IO/R"}


def test_relative_resolution_and_hosts(spark):
    df = spark.createDataFrame(
        [(1, _page(["/abs/path", "rel.html", "https://x.com/a",
                    "https://me.io/self"]), "https://me.io/dir/page"),
         (2, _page(["/nowhere"]), None)],
        "id long, h string, base string")
    got = {(r["src"], r["url"]) for r in
           extract_links(df, "id", "h", base_col="base").collect()}
    # relative links resolve against the page ORIGIN; no base -> dropped
    assert got == {(1, "https://me.io/abs/path"), (1, "https://me.io/rel.html"),
                   (1, "https://x.com/a"), (1, "https://me.io/self")}
    hosts = {(r["src_host"], r["dst_host"]) for r in
             extract_links(df, "id", "h", base_col="base", hosts=True).collect()}
    # self-host edges drop; dst hosts lowercase
    assert hosts == {("me.io", "x.com")}


def test_protocol_relative_resolution(spark):
    # '//other.com/path' is a network-path reference (RFC 3986): it
    # keeps its OWN host and takes only the scheme from the base —
    # never '<origin>//other.com/path' (a cross-host link mis-filed
    # under the base host would bias the frontier host graph)
    df = spark.createDataFrame(
        [(1, _page(["//cdn.other.com/lib.js", "/local"]),
          "https://me.io/dir/page"),
         (2, _page(["//nohost.example/x"]), None)],
        "id long, h string, base string")
    got = {(r["src"], r["url"]) for r in
           extract_links(df, "id", "h", base_col="base").collect()}
    assert got == {(1, "https://cdn.other.com/lib.js"),
                   (1, "https://me.io/local")}
    hosts = {(r["src_host"], r["dst_host"]) for r in
             extract_links(df, "id", "h", base_col="base",
                           hosts=True).collect()}
    assert hosts == {("me.io", "cdn.other.com")}


def test_null_and_empty_html(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "plain text no links")],
        "id long, h string")
    assert extract_links(df, "id", "h").count() == 0


def test_frontier_ranking_composition(spark):
    # three hosts: everyone links to hub.com, hub links out to one —
    # PageRank must rank hub.com first (the crawl-frontier decision)
    pages = [
        (1, _page(["https://hub.com/a"]), "https://s1.org/p"),
        (2, _page(["https://hub.com/b"]), "https://s2.org/p"),
        (3, _page(["https://s1.org/home"]), "https://hub.com/p"),
    ]
    df = spark.createDataFrame(pages, "id long, h string, base string")
    edges = extract_links(df, "id", "h", base_col="base", hosts=True)
    from wrangler_spark.datapipe.graph import graph_pagerank

    ranks = graph_pagerank(edges, "src_host", "dst_host", iters=5).collect()
    top = max(ranks, key=lambda r: r["pagerank"])
    assert top["node"] == "hub.com"


def test_scan_side_plan(spark):
    df = spark.createDataFrame([(1, _page(["https://a.com"]))], "id long, h string")
    out = extract_links(df, "id", "h")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan
