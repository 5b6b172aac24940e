"""Jensen-Shannon text drift over hashed unigram distributions:
identity, disjointness, symmetry, bucket-space bound, invariance."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe.text import js_divergence


def test_identity_disjoint_symmetry(spark):
    a = spark.createDataFrame([("the cat sat on the mat",)] * 20, "text string")
    c = spark.createDataFrame([("quantum flux capacitor engaged",)] * 20, "text string")
    same = js_divergence(a, a).collect()[0]
    assert same["js"] == 0.0 and same["n_a"] == same["n_b"] == 120
    dis = js_divergence(a, c).collect()[0]
    assert dis["js"] == 1.0  # disjoint vocabularies saturate at 1 bit
    ab = js_divergence(a, c).collect()[0]["js"]
    ba = js_divergence(c, a).collect()[0]["js"]
    assert ab == ba  # symmetric by construction


def test_partial_overlap_and_invariance(spark):
    a = spark.createDataFrame([("alpha beta gamma",)] * 30, "text string")
    d = spark.createDataFrame(
        [("alpha beta gamma",)] * 15 + [("delta epsilon zeta",)] * 15,
        "text string")
    mid = js_divergence(a, d).collect()[0]["js"]
    assert 0.0 < mid < 1.0
    x = js_divergence(a.repartition(1), d.repartition(1)).collect()[0]["js"]
    y = js_divergence(a.repartition(13), d.repartition(7)).collect()[0]["js"]
    assert x == y == mid
    with pytest.raises(ValueError, match="buckets"):
        js_divergence(a, d, buckets=4)


def test_python_reference(spark):
    import hashlib
    import math

    ta = ["the cat sat on the mat".split()] * 10
    tb = ["the dog ran far away now".split()] * 10
    a = spark.createDataFrame([(" ".join(w),) for w in ta], "text string")
    b = spark.createDataFrame([(" ".join(w),) for w in tb], "text string")
    B = 65536

    def hist(tokss):
        out = {}
        for toks in tokss:
            for t in toks:
                bk = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % B
                out[bk] = out.get(bk, 0) + 1
        return out

    ha, hb = hist(ta), hist(tb)
    na, nb = sum(ha.values()), sum(hb.values())
    s = 0
    for bk in set(ha) | set(hb):
        ca, cb = ha.get(bk, 0), hb.get(bk, 0)
        p, q = ca / na, cb / nb
        term = 0.0
        if ca > 0:
            term += 0.5 * p * math.log2(2 * p / (p + q))
        if cb > 0:
            term += 0.5 * q * math.log2(2 * q / (p + q))
        s += round(term * 1e9)
    expect = round(s / 1e9, 6)
    got = js_divergence(a, b).collect()[0]["js"]
    assert got == expect


def test_js_from_vocab_states(spark, tmp_path_factory):
    from wrangler_spark.datapipe.text import js_from_vocab_states, vocab_update_state

    a = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)], "doc_id long, text string")
    b = spark.createDataFrame(
        [(i, "the dog ran far away now") for i in range(20)], "doc_id long, text string")
    pa = str(tmp_path_factory.mktemp("jsva")) + "/st"
    pb = str(tmp_path_factory.mktemp("jsvb")) + "/st"
    vocab_update_state(a, pa, "text", batch_id="b0")
    vocab_update_state(b, pb, "text", batch_id="b0")
    from_state = js_from_vocab_states(spark, pa, pb).collect()[0]
    direct = js_divergence(a, b).collect()[0]
    # state path == direct corpus path, bit for bit
    assert (from_state["js"], from_state["n_a"], from_state["n_b"]) == (
        direct["js"], direct["n_a"], direct["n_b"])
    # one state against itself (latest vs latest) is zero drift
    same = js_from_vocab_states(spark, pa).collect()[0]
    assert same["js"] == 0.0
