"""Experiment-health statistics: sample-ratio mismatch (Fabijan et al.,
KDD 2019) and CUPED variance reduction (Deng, Xu, Kohavi & Walker,
WSDM 2013). Python references mirror the library's micro-integer +
fixed-double-order arithmetic exactly."""

import math

import pytest

from wrangler_spark.datapipe import events


def test_chi2_critical_table_and_tail():
    # published table constants
    assert events.chi2_critical(1, "0.001") == 10.828
    assert events.chi2_critical(2, "0.001") == 13.816
    assert events.chi2_critical(1, "0.05") == 3.841
    # Wilson-Hilferty tail beyond the table: monotone in df and close
    # to the published df=30 values (0.001: 59.703, 0.05: 43.773)
    assert abs(events.chi2_critical(30, "0.001") - 59.703) < 0.15
    assert abs(events.chi2_critical(30, "0.05") - 43.773) < 0.02
    assert events.chi2_critical(25, "0.01") < events.chi2_critical(26, "0.01")
    with pytest.raises(ValueError, match="alpha"):
        events.chi2_critical(3, "0.1")


def test_srm_balanced_split_passes(spark):
    rows = [(u, str(u % 3)) for u in range(300)]
    df = spark.createDataFrame(rows, "u long, arm string")
    got = {r["arm"]: r for r in events.srm_check(df, "u", "arm").collect()}
    assert set(got) == {"0", "1", "2"}
    for r in got.values():
        assert r["users"] == 100 and r["expected_users"] == 100.0
        assert r["chi2"] == 0.0 and r["df"] == 2 and r["srm"] is False


def test_srm_detects_mismatch_and_counts_distinct(spark):
    # 900 vs 100 units against a planned 50/50: chi2 = 2*(400^2/500) = 640
    rows = [(u, "a") for u in range(900)] + [(u, "b") for u in range(900, 1000)]
    rows += [(5, "a")] * 3  # duplicate exposures of one unit count once
    df = spark.createDataFrame(rows, "u long, arm string")
    got = {r["arm"]: r for r in events.srm_check(
        df, "u", "arm", ratios={"a": 1.0, "b": 1.0}).collect()}
    assert got["a"]["users"] == 900 and got["b"]["users"] == 100
    assert got["a"]["expected_users"] == 500.0
    assert got["a"]["chi2"] == 640.0 and got["a"]["df"] == 1
    assert got["a"]["srm"] is True
    assert got["a"]["ratio"] == 0.9 and got["a"]["expected_ratio"] == 0.5


def test_srm_weighted_ratios_reference(spark):
    # 60/40 observed against planned 75/25 over 200 units
    rows = [(u, "a") for u in range(120)] + [(u, "b") for u in range(120, 200)]
    df = spark.createDataFrame(rows, "u long, arm string")
    got = {r["arm"]: r for r in events.srm_check(
        df, "u", "arm", ratios={"a": 3.0, "b": 1.0}).collect()}
    ea, eb = 200 * 0.75, 200 * 0.25
    chi = round((120 - ea) ** 2 / ea + (80 - eb) ** 2 / eb, 6)
    assert got["a"]["expected_users"] == 150.0
    assert got["b"]["expected_users"] == 50.0
    assert got["a"]["chi2"] == chi
    assert got["a"]["srm"] == (chi > 10.828)


def test_srm_zero_observed_planned_arm(spark):
    # A planned arm with ZERO observed units must stay in the test:
    # its (0-e)^2/e term is the largest possible component, and the
    # arm must emit a row (users=0) rather than silently vanish.
    rows = [(u, "a") for u in range(150)] + [(u, "b") for u in range(150, 300)]
    df = spark.createDataFrame(rows, "u long, arm string")
    got = {r["arm"]: r for r in events.srm_check(
        df, "u", "arm", ratios={"a": 1.0, "b": 1.0, "c": 1.0}).collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["c"]["users"] == 0 and got["c"]["ratio"] == 0.0
    e = 300 / 3  # n * w/sum_w
    chi = round(2 * (150 - e) ** 2 / e + (0 - e) ** 2 / e, 6)
    assert got["c"]["expected_users"] == 100.0
    assert got["c"]["chi2"] == chi and got["c"]["df"] == 2
    assert got["c"]["srm"] is True  # 150 > 13.816


def test_srm_validation(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "u long, arm string")
    with pytest.raises(ValueError, match="at least two"):
        events.srm_check(df.filter("arm = 'a'"), "u", "arm")
    with pytest.raises(ValueError, match="absent from"):
        events.srm_check(df, "u", "arm", ratios={"a": 1.0})
    with pytest.raises(ValueError, match="weights must be > 0"):
        events.srm_check(df, "u", "arm", ratios={"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="max_arms"):
        events.srm_check(df, "u", "arm", max_arms=1)
    with pytest.raises(ValueError, match="alpha"):
        events.srm_check(df, "u", "arm", alpha="0.1")


def test_user_period_metrics_split_and_micros(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.1),
            (1, "2024-01-05 00:00:00", 2.2),
            (1, "2024-01-20 00:00:00", 4.4),
            (2, "2024-01-25 00:00:00", 8.0),   # post-only user: pre = 0
            (3, "2024-01-02 00:00:00", None),  # null metric filtered
        ],
        "u long, ts string, v double",
    ).selectExpr("u", "cast(ts as timestamp) ts", "v")
    got = {r["u"]: r for r in events.user_period_metrics(
        df, "u", "ts", "v", "2024-01-16").collect()}
    assert got[1]["pre"] == 3.3 and got[1]["post"] == 4.4
    assert got[2]["pre"] == 0.0 and got[2]["post"] == 8.0
    assert 3 not in got


def _cuped_reference(units):
    """Identical arithmetic to cuped_ab_test: micro-integer moments,
    pooled theta, fixed double order, 6dp terminal rounding."""
    def micros(v):
        return round(v * 1e6)

    arms = {"a": [], "b": []}
    for arm, y, x in units:
        arms[arm].append((micros(y), micros(x)))

    def mom(rows):
        n = len(rows)
        sy = sum(y for y, _ in rows)
        sx = sum(x for _, x in rows)
        sxy = sum(x * y for y, x in rows)
        sxx = sum(x * x for _, x in rows)
        syy = sum(y * y for y, _ in rows)
        return n, sy, sx, sxy, sxx, syy

    na, sya, sxa, sxya, sxxa, syya = mom(arms["a"])
    nb, syb, sxb, sxyb, sxxb, syyb = mom(arms["b"])
    n, sy, sx = na + nb, sya + syb, sxa + sxb
    sxy, sxx = sxya + sxyb, sxxa + sxxb
    varp = float(n * sxx - sx * sx)
    theta = float(n * sxy - sx * sy) / varp if varp > 0 else None
    mean_x = sx / (n * 1e6)

    def stats(nn, syt, sxt, sxyt, sxxt, syyt):
        my = syt / (nn * 1e6)
        mx = sxt / (nn * 1e6)
        den = nn * (nn - 1) * 1e12
        vy = (nn * syyt - syt * syt) / den
        vx = (nn * sxxt - sxt * sxt) / den
        cv = (nn * sxyt - sxt * syt) / den
        if theta is not None:
            ma = my - theta * (mx - mean_x)
            va = vy - 2.0 * theta * cv + theta * theta * vx
        else:
            ma, va = my, vy
        return my, ma, vy, va

    mya, maa, vya, vaa = stats(na, sya, sxa, sxya, sxxa, syya)
    myb, mab, vyb, vab = stats(nb, syb, sxb, sxyb, sxxb, syyb)
    se = math.sqrt(vya / na + vyb / nb)
    se_adj = math.sqrt(max(vaa, 0.0) / na + max(vab, 0.0) / nb)
    return {
        "theta": round(theta, 6) if theta is not None else None,
        "mean_a": round(mya, 6), "mean_b": round(myb, 6),
        "mean_a_adj": round(maa, 6), "mean_b_adj": round(mab, 6),
        "diff_adj": round(maa - mab, 6),
        "se": round(se, 6), "se_adj": round(se_adj, 6),
        "z_adj": round((maa - mab) / se_adj, 6) if se_adj > 0 else None,
        "var_reduction_a": round(1.0 - vaa / vya, 6) if vya > 0 else None,
        "var_reduction_b": round(1.0 - vab / vyb, 6) if vyb > 0 else None,
    }


def test_cuped_reference_and_variance_reduction(spark):
    # metric strongly correlated with the covariate: CUPED must shrink
    # the variance (var_reduction ~ rho^2) without moving the diff far
    units = []
    for i in range(40):
        x = 10.0 + (i % 7) * 2.5
        units.append(("a", x * 1.5 + 3.0 + (i % 3) * 0.25, x))
    for i in range(40):
        x = 11.0 + (i % 7) * 2.5
        units.append(("b", x * 1.5 + 4.0 + (i % 3) * 0.25, x))
    df = spark.createDataFrame(units, "arm string, y double, x double")
    got = events.cuped_ab_test(df, "arm", "y", "x", "a", "b").collect()[0]
    ref = _cuped_reference(units)
    for k, v in ref.items():
        assert got[k] == v, (k, got[k], v)
    assert got["users_a"] == 40 and got["users_b"] == 40
    assert got["var_reduction_a"] > 0.9  # near-perfect covariate
    assert got["se_adj"] < got["se"]
    assert got["significant"] == (abs(got["z_adj"]) > 1.96)


def test_cuped_constant_covariate_falls_back(spark):
    units = [("a", float(i % 5), 7.0) for i in range(10)]
    units += [("b", float(i % 4), 7.0) for i in range(10)]
    df = spark.createDataFrame(units, "arm string, y double, x double")
    got = events.cuped_ab_test(df, "arm", "y", "x", "a", "b").collect()[0]
    assert got["theta"] is None
    assert got["mean_a_adj"] == got["mean_a"]
    assert got["z_adj"] == got["z"]
    assert got["var_reduction_a"] == 0.0


def test_cuped_ignores_other_arms_and_nulls(spark):
    units = [("a", 1.0, 2.0), ("b", 3.0, 4.0), ("c", 9.0, 9.0),
             ("a", None, 2.0), ("b", 3.0, None), ("a", 5.0, 6.0),
             ("b", 7.0, 8.0)]
    df = spark.createDataFrame(units, "arm string, y double, x double")
    got = events.cuped_ab_test(df, "arm", "y", "x", "a", "b").collect()[0]
    assert got["users_a"] == 2 and got["users_b"] == 2


def test_srm_and_cuped_directives(spark):
    from wrangler_spark.pipeline import Pipeline

    exp = spark.createDataFrame(
        [(u, str(u % 2)) for u in range(40)], "unit long, arm string")
    out = Pipeline.compile(
        "srm-check :unit :arm '0:1,1:1' '0.05'").apply(exp)
    assert {r["arm"] for r in out.collect()} == {"0", "1"}

    units = spark.createDataFrame(
        [("a", 2.0, 1.0), ("a", 4.0, 3.0), ("b", 3.0, 2.0),
         ("b", 5.0, 4.0)],
        "arm string, y double, x double")
    out = Pipeline.compile("cuped-ab :arm :y :x 'a' 'b'").apply(units)
    row = out.collect()[0]
    assert row["users_a"] == 2 and row["users_b"] == 2


def test_chi2_independence_reference(spark):
    from wrangler_spark.datapipe import numeric

    # classic 2x2: [[20, 30], [30, 20]] -> chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    rows = ([("x", "p")] * 20 + [("x", "q")] * 30
            + [("y", "p")] * 30 + [("y", "q")] * 20)
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.chi_square_independence(df, "a", "b").collect()[0]
    n = 100
    exp = n * (20 * 20 - 30 * 30) ** 2 / (50 * 50 * 50 * 50)
    assert got["n"] == n and got["dof"] == 1
    assert got["levels_a"] == 2 and got["levels_b"] == 2
    assert abs(got["chi2"] - exp) < 1e-6
    assert abs(got["cramers_v"] - (exp / n) ** 0.5) < 1e-6


def test_chi2_independence_zero_cell_and_nulls(spark):
    from wrangler_spark.datapipe import numeric

    # (y, q) never observed but has positive margins: the closed form
    # must still charge its expected count; NULL is a real level
    rows = [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5
    rows += [(None, "p")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.chi_square_independence(df, "a", "b").collect()[0]
    assert got["levels_a"] == 3 and got["levels_b"] == 2
    # python reference over the FULL grid (zero cells included)
    import itertools

    obs = {("x", "p"): 5, ("x", "q"): 5, ("y", "p"): 5, ("∅", "p"): 5}
    ra = {"x": 10, "y": 5, "∅": 5}
    cb = {"p": 15, "q": 5}
    n = 20
    chi = sum(
        (obs.get((i, j), 0) - ra[i] * cb[j] / n) ** 2 / (ra[i] * cb[j] / n)
        for i, j in itertools.product(ra, cb))
    assert abs(got["chi2"] - chi) < 1e-6
    with pytest.raises(ValueError, match="max_cells"):
        numeric.chi_square_independence(df, "a", "b", max_cells=2)


def test_chi2_perfect_independence(spark):
    from wrangler_spark.datapipe import numeric

    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.chi_square_independence(df, "a", "b").collect()[0]
    assert got["chi2"] == 0.0 and got["cramers_v"] == 0.0


def test_cohens_kappa_textbook(spark):
    from wrangler_spark.datapipe import numeric

    # Cohen's own shape: diag 45, off-diag [[45,15],[25,15]] over 100
    rows = ([("yes", "yes")] * 45 + [("yes", "no")] * 15
            + [("no", "yes")] * 25 + [("no", "no")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.cohens_kappa(df, "a", "b").collect()[0]
    po = 0.60
    pe = (60 * 70 + 40 * 30) / 100 / 100  # 0.54
    kap = round((po - pe) / (1 - pe), 6)
    assert got["po"] == po and got["pe"] == pe
    assert got["kappa"] == kap
    assert got["agreement"] == "slight"  # 0.130435


def test_cohens_kappa_edges(spark):
    from wrangler_spark.datapipe import numeric

    # perfect agreement over >1 class: kappa = 1, almost_perfect
    rows = [("a", "a")] * 5 + [("b", "b")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.cohens_kappa(df, "a", "b").collect()[0]
    assert got["kappa"] == 1.0 and got["agreement"] == "almost_perfect"

    # both raters constant and equal: pe = 1 -> undefined, NULL
    df = spark.createDataFrame([("a", "a")] * 5, "a string, b string")
    got = numeric.cohens_kappa(df, "a", "b").collect()[0]
    assert got["kappa"] is None and got["agreement"] is None

    # disjoint label sets: po = 0, kappa < 0 -> poor
    rows = [("a", "b")] * 5 + [("b", "a")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = numeric.cohens_kappa(df, "a", "b").collect()[0]
    assert got["po"] == 0.0 and got["kappa"] < 0
    assert got["agreement"] == "poor"


def test_chi2_and_kappa_directives(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("x", "p")] * 6 + [("y", "q")] * 6, "a string, b string")
    out = Pipeline.compile("chi2-independence :a :b").apply(df)
    assert out.collect()[0]["dof"] == 1
    out = Pipeline.compile("cohens-kappa :a :b").apply(df)
    assert out.collect()[0]["po"] == 0.0


def test_mann_whitney_brute_force_reference(spark):
    from wrangler_spark.datapipe import numeric
    import collections
    import math
    import random

    random.seed(7)
    av = [round(random.gauss(10, 2), 1) for _ in range(60)]
    bv = [round(random.gauss(11.5, 2), 1) for _ in range(50)]
    df = spark.createDataFrame(
        [("a", v) for v in av] + [("b", v) for v in bv]
        + [("c", 99.0), ("a", None)],  # other group + null drop
        "g string, v double")
    got = numeric.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in av for y in bv)
    na, nb, n = len(av), len(bv), len(av) + len(bv)
    ties = collections.Counter(av + bv)
    T = sum(c ** 3 - c for c in ties.values())
    mu = na * nb / 2.0
    var = na * nb / 12.0 * ((n + 1) - T / (n * (n - 1)))
    z = round((u2 / 2.0 - mu) / math.sqrt(var), 6)
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["u"] == u2 / 2.0 and got["z"] == z
    assert got["rank_biserial"] == round(1 - u2 / (na * nb), 6)
    assert got["significant"] == (abs(z) > 1.96)


def test_mann_whitney_identical_groups_and_guards(spark):
    from wrangler_spark.datapipe import numeric

    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals] + [("b", v) for v in vals],
        "g string, v double")
    got = numeric.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # identical distributions: U = na*nb/2, z = 0, no effect
    assert got["u"] == got["mu_u"] and got["z"] == 0.0
    assert got["rank_biserial"] == 0.0 and got["significant"] is False

    # all values tied: sigma = 0 -> z NULL
    dfc = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", 5.0)] * 4, "g string, v double")
    got = numeric.mann_whitney_u(dfc, "v", "g", "a", "b").collect()[0]
    assert got["z"] is None and got["significant"] is None

    with pytest.raises(ValueError, match="distinct values"):
        numeric.mann_whitney_u(df, "v", "g", "a", "b", max_cells=2)
    with pytest.raises(ValueError, match="no rows"):
        numeric.mann_whitney_u(
            df.filter("g = 'zzz'"), "v", "g", "a", "b")


def test_benford_reference_and_bands(spark):
    from wrangler_spark.datapipe import numeric
    import math

    # perfectly Benford-ish synthetic: counts proportional to log10(1+1/d)
    n = 10000
    rows = []
    for d in range(1, 10):
        c = round(n * math.log10(1 + 1 / d))
        rows += [(float(d * 11),)] * c  # leading digit d
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r for r in
           numeric.benford_deviation(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    assert got[1]["conformity"] in ("close", "acceptable")
    assert got[1]["mad"] < 0.012
    # observed proportions track expectations
    for d in range(1, 10):
        assert abs(got[d]["observed_p"] - got[d]["expected_p"]) < 0.001

    # uniform digits: far from Benford
    dfu = spark.createDataFrame(
        [(float(d),) for d in range(1, 10) for _ in range(100)],
        "v double")
    got = numeric.benford_deviation(dfu, "v").collect()[0]
    assert got["conformity"] == "nonconforming"


def test_benford_micro_digit_zero_and_missing_digits(spark):
    from wrangler_spark.datapipe import numeric

    # |v| < 5e-7 -> micro 0 -> excluded; sub-1 values use the micro
    # integer's leading digit (0.025 -> 25000 -> digit 2); a digit with
    # no observations still gets a row with expected mass
    df = spark.createDataFrame(
        [(0.0,), (1e-9,), (0.025,), (2.5,), (250.0,), (None,)],
        "v double")
    got = {r["digit"]: r for r in
           numeric.benford_deviation(df, "v").collect()}
    assert got[2]["observed"] == 3 and got[2]["n"] == 3
    assert got[7]["observed"] == 0
    assert len(got) == 9


def test_mw_and_benford_directives(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)],
        "g string, v double")
    out = Pipeline.compile("mann-whitney :v :g 'a' 'b'").apply(df)
    assert out.collect()[0]["u"] == 0.0
    out = Pipeline.compile("benford-check :v").apply(df)
    assert out.count() == 9


def _welch_reference(av, bv):
    import math

    def mom(vals):
        mv = [round(v * 1e6) for v in vals]
        n = len(mv)
        s, ss = sum(mv), sum(m * m for m in mv)
        mean = s / (n * 1e6)
        var = (n * ss - s * s) / (n * (n - 1) * 1e12)
        return n, mean, var

    na, ma, va = mom(av)
    nb, mb, vb = mom(bv)
    qa, qb = va / na, vb / nb
    se = math.sqrt(qa + qb)
    t = round((ma - mb) / se, 6)
    dfree = round((qa + qb) ** 2
                  / (qa * qa / (na - 1) + qb * qb / (nb - 1)), 6)
    pooled = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    d = round((ma - mb) / math.sqrt(pooled), 6)
    return {"mean_a": round(ma, 6), "mean_b": round(mb, 6),
            "var_a": round(va, 6), "var_b": round(vb, 6),
            "se": round(se, 6), "t": t, "df": dfree, "cohens_d": d}


def test_welch_reference_and_unequal_variance(spark):
    from wrangler_spark.datapipe import numeric
    import random

    random.seed(11)
    av = [round(random.gauss(100, 5), 2) for _ in range(50)]
    bv = [round(random.gauss(104, 25), 2) for _ in range(40)]
    df = spark.createDataFrame(
        [("a", v) for v in av] + [("b", v) for v in bv]
        + [("c", 0.0), ("a", None)],
        "g string, v double")
    got = numeric.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    ref = _welch_reference(av, bv)
    for k, v in ref.items():
        assert got[k] == v, (k, got[k], v)
    assert got["n_a"] == 50 and got["n_b"] == 40
    # Welch df must sit between min(n)-1 and n_a+n_b-2, pulled toward
    # the high-variance arm
    assert 39 <= got["df"] <= 88
    assert got["significant"] == (abs(got["t"]) > 1.96)


def test_welch_zero_variance_null_t(spark):
    from wrangler_spark.datapipe import numeric

    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double")
    got = numeric.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    assert got["t"] is None and got["significant"] is None
    assert got["cohens_d"] is None


def test_welch_single_row_group_null_not_nan(spark):
    from wrangler_spark.datapipe import numeric

    # n_b = 1 -> sample variance is 0/0 territory: the n > 1 guard
    # must yield NULL (matching the oracle's CASE WHEN), never NaN
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)],
        "g string, v double")
    got = numeric.welch_t_test(df, "v", "g", "a", "b").collect()[0]
    assert got["n_b"] == 1 and got["mean_b"] == 5.0
    assert got["var_b"] is None
    assert got["t"] is None and got["significant"] is None
    for k in ("var_b", "se", "t", "df", "cohens_d"):
        assert got[k] is None or not math.isnan(got[k]), k


def test_kruskal_listed_group_with_zero_rows_null(spark):
    from wrangler_spark.datapipe import numeric

    # group 'c' is listed but absent: its rank-sum term is 0/0 — the
    # N_i > 0 guard must propagate NULL through H (not NaN, and not a
    # silently smaller statistic with the wrong df)
    vals = [1.0, 2.0, 3.0, 9.0, 10.0, 11.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals[:3]] + [("b", v) for v in vals[3:]],
        "g string, v double")
    got = numeric.kruskal_wallis(df, "v", "g", ["a", "b", "c"]).collect()[0]
    assert got["k"] == 3 and got["df"] == 2
    assert got["h"] is None and got["h_corrected"] is None
    assert got["significant"] is None
    for k in ("h", "h_corrected", "epsilon_sq"):
        assert got[k] is None or not math.isnan(got[k]), k


def test_ratio_ab_single_row_arm_null_not_nan(spark):
    from wrangler_spark.datapipe import events as ev

    df = spark.createDataFrame(
        [("0", 1.0, 2.0), ("0", 3.0, 4.0), ("1", 5.0, 6.0)],
        "arm string, x double, y double")
    got = ev.ratio_ab_test(df, "arm", "x", "y", "0", "1").collect()[0]
    assert got["users_b"] == 1 and got["ratio_b"] is not None
    assert got["se"] is None and got["z"] is None
    for k in ("se", "z"):
        assert got[k] is None or not math.isnan(got[k]), k


def test_embedding_drift_reference(spark):
    from wrangler_spark.datapipe import similarity
    import math

    a = [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.2, 0.0])]
    b = [(3, [0.0, 1.0, 0.0]), (4, [0.2, 1.0, 0.0])]
    bad = [(5, [1.0]), (6, None)]  # wrong dim / null dropped
    dfa = spark.createDataFrame(a + bad, "vec_id long, embedding array<double>")
    dfb = spark.createDataFrame(b, "vec_id long, embedding array<double>")
    got = similarity.embedding_drift(dfa, dfb, dim=3).collect()[0]
    assert got["n_a"] == 2 and got["n_b"] == 2 and got["dim"] == 3
    # integer-sum mirror
    sa = [2_000_000, 200_000, 0]
    sb = [200_000, 2_000_000, 0]
    dot = sum(x * y for x, y in zip(sa, sb))
    cos = round(dot / (math.sqrt(sum(x * x for x in sa))
                       * math.sqrt(sum(y * y for y in sb))), 6)
    assert got["centroid_cosine"] == cos
    assert got["centroid_shift"] == round(1.0 - cos, 6)
    norms_a = [round(math.sqrt(sum(x * x for x in v)) * 1e6)
               for _, v in a]
    assert got["mean_norm_a"] == round(sum(norms_a) / (2 * 1e6), 6)

    # identical corpora: cosine 1, shift 0
    same = similarity.embedding_drift(dfb, dfb, dim=3).collect()[0]
    assert same["centroid_cosine"] == 1.0 and same["centroid_shift"] == 0.0
    with pytest.raises(ValueError, match="dim"):
        similarity.embedding_drift(dfa, dfb, dim=0)


def test_welch_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 7.0)],
        "g string, v double")
    out = Pipeline.compile("welch-t :v :g 'a' 'b'").apply(df)
    assert out.collect()[0]["diff"] == -4.5


def _kruskal_reference(data, labels):
    from collections import Counter, defaultdict

    cnt = Counter(v for _, v in data)
    pergroup = defaultdict(Counter)
    for g, v in data:
        pergroup[g][v] += 1
    cum, midrank = 0, {}
    for v in sorted(cnt):
        midrank[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    n = len(data)
    s = 0.0
    for lab in labels:
        rg = sum(pergroup[lab][v] * midrank[v] for v in midrank)
        ng = sum(pergroup[lab].values())
        s += (2 * rg) * (2 * rg) / (4.0 * ng)
    h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    t = sum(c ** 3 - c for c in cnt.values())
    hc = h / (1.0 - t / (n ** 3 - n))
    return round(h, 6), round(hc, 6)


def test_kruskal_reference_and_ties(spark):
    from wrangler_spark.datapipe import numeric
    import random

    random.seed(3)
    data = []
    for gi, (lab, mu) in enumerate([("a", 10), ("b", 12), ("c", 10.5)]):
        data += [(lab, round(random.gauss(mu, 2), 1))
                 for _ in range(40 + gi * 5)]
    df = spark.createDataFrame(
        data + [("zz", 1.0), ("a", None)], "g string, v double")
    got = numeric.kruskal_wallis(df, "v", "g", ["a", "b", "c"]).collect()[0]
    h, hc = _kruskal_reference(data, ["a", "b", "c"])
    assert got["h"] == h and got["h_corrected"] == hc
    assert got["n"] == len(data) and got["k"] == 3 and got["df"] == 2
    assert got["significant"] == (hc > 5.991)


def test_kruskal_identical_groups_and_validation(spark):
    from wrangler_spark.datapipe import numeric

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame(
        [(g, v) for g in "ab" for v in vals], "g string, v double")
    got = numeric.kruskal_wallis(df, "v", "g", ["a", "b"]).collect()[0]
    assert got["h_corrected"] == 0.0 and got["significant"] is False

    # every value tied: the correction denominator hits 0 -> NULL
    dfc = spark.createDataFrame(
        [("a", 7.0)] * 3 + [("b", 7.0)] * 3, "g string, v double")
    got = numeric.kruskal_wallis(dfc, "v", "g", ["a", "b"]).collect()[0]
    assert got["h_corrected"] is None and got["significant"] is None

    with pytest.raises(ValueError, match="at least two"):
        numeric.kruskal_wallis(df, "v", "g", ["a"])
    with pytest.raises(ValueError, match="duplicate"):
        numeric.kruskal_wallis(df, "v", "g", ["a", "a"])
    with pytest.raises(ValueError, match="distinct values"):
        numeric.kruskal_wallis(df, "v", "g", ["a", "b"], max_cells=2)


def test_kruskal_matches_mann_whitney_two_groups(spark):
    # with k = 2, KW and MW must agree on significance (H = z^2 up to
    # the tie treatment both share)
    from wrangler_spark.datapipe import numeric
    import random

    random.seed(9)
    rows = [("a", round(random.gauss(10, 2), 1)) for _ in range(60)]
    rows += [("b", round(random.gauss(12, 2), 1)) for _ in range(60)]
    df = spark.createDataFrame(rows, "g string, v double")
    kw = numeric.kruskal_wallis(df, "v", "g", ["a", "b"]).collect()[0]
    mw = numeric.mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    assert kw["significant"] == mw["significant"]
    assert abs(kw["h_corrected"] - mw["z"] ** 2) < 0.01


def test_kruskal_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 9.0), ("b", 8.0)],
        "g string, v double")
    out = Pipeline.compile("kruskal-wallis :v :g 'a,b'").apply(df)
    assert out.collect()[0]["k"] == 2


def test_profile_diff_statuses_and_deltas(spark):
    from wrangler_spark.datapipe import curation

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, None, 3.0)],
        "id long, s string, v double")
    b = spark.createDataFrame(
        [(1, "x", "p"), (2, "x", "q"), (3, "x", "r"), (4, "x", "s")],
        "id long, s string, extra string")
    got = {r["column"]: r for r in
           curation.profile_diff(a, b, exact=True).collect()}
    assert got["v"]["status"] == "dropped"
    assert got["extra"]["status"] == "added"
    assert got["extra"]["n_rows_a"] is None
    assert got["id"]["status"] == "common"
    assert got["id"]["n_rows_a"] == 3 and got["id"]["n_rows_b"] == 4
    assert got["id"]["range_changed"] is True   # max 3 -> 4
    assert got["s"]["dtype_changed"] is False
    # null_frac: a has 1/3 null s, b has 0
    assert got["s"]["null_frac_delta"] == round(0.0 - round(1 / 3, 6), 6)
    assert got["s"]["n_distinct_delta"] == 1 - 3  # {x,y,NULL} -> {x}


def test_ratio_ab_reference(spark):
    import math
    import random

    random.seed(5)
    units = []
    for arm, base in (("0", 0.30), ("1", 0.36)):
        for _ in range(200):
            views = random.randint(5, 40)
            clicks = sum(1 for _ in range(views)
                         if random.random() < base)
            units.append((arm, float(clicks), float(views)))
    df = spark.createDataFrame(units, "arm string, x double, y double")
    got = events.ratio_ab_test(df, "arm", "x", "y", "0", "1").collect()[0]

    def stats(rows):
        xs = [round(x * 1e6) for _, x, _ in rows]
        ys = [round(y * 1e6) for _, _, y in rows]
        n = len(rows)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        r = sx / sy
        my = sy / (n * 1e6)
        den = n * (n - 1) * 1e12
        vx, vy = (n * sxx - sx * sx) / den, (n * syy - sy * sy) / den
        cov = (n * sxy - sx * sy) / den
        return n, r, (vx + r * r * vy - 2.0 * r * cov) / (n * my * my)

    _, ra, va = stats([u for u in units if u[0] == "0"])
    _, rb, vb = stats([u for u in units if u[0] == "1"])
    se = math.sqrt(max(va + vb, 0.0))
    assert got["ratio_a"] == round(ra, 6)
    assert got["z"] == round((ra - rb) / se, 6)
    assert got["users_a"] == 200 and got["users_b"] == 200
    # the true rates differ by 6 points at n=200: must be significant
    assert got["significant"] is True


def test_ratio_ab_degenerate_denominator(spark):
    df = spark.createDataFrame(
        [("0", 1.0, 0.0), ("0", 2.0, 0.0), ("1", 1.0, 1.0),
         ("1", 2.0, 1.0)],
        "arm string, x double, y double")
    got = events.ratio_ab_test(df, "arm", "x", "y", "0", "1").collect()[0]
    assert got["ratio_a"] is None and got["z"] is None


def test_msprt_reference_and_peeking_validity(spark):
    import math
    import random

    random.seed(13)
    rows = [("a", round(random.gauss(10, 3), 2)) for _ in range(300)]
    rows += [("b", round(random.gauss(10.1, 3), 2)) for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = events.msprt_ab_test(df, "g", "v", "a", "b", tau=0.5).collect()[0]

    def mom(vals):
        mv = [round(v * 1e6) for v in vals]
        n, s, ss = len(mv), sum(mv), sum(m * m for m in mv)
        return n, s / (n * 1e6), (n * ss - s * s) / (n * (n - 1) * 1e12)

    na, ma, va = mom([v for g, v in rows if g == "a"])
    nb, mb, vb = mom([v for g, v in rows if g == "b"])
    V = va / na + vb / nb
    d = ma - mb
    t2 = 0.25
    ll = 0.5 * math.log(V / (V + t2)) + d * d * t2 / (2.0 * V * (V + t2))
    assert got["log_lambda"] == round(ll, 6)
    assert got["p_always_valid"] == round(min(1.0, math.exp(-ll)), 6)
    # a null-ish effect at n=300 must NOT trip the always-valid test
    assert got["significant"] is False
    with pytest.raises(ValueError, match="tau"):
        events.msprt_ab_test(df, "g", "v", "a", "b", tau=0.0)
    with pytest.raises(ValueError, match="alpha"):
        events.msprt_ab_test(df, "g", "v", "a", "b", alpha=1.5)


def test_ratio_and_msprt_directives(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("b", 3.0, 4.0),
         ("b", 2.0, 2.0)],
        "arm string, x double, y double")
    out = Pipeline.compile("ratio-ab :arm :x :y 'a' 'b'").apply(df)
    assert out.collect()[0]["ratio_a"] == 0.5
    out = Pipeline.compile("msprt-ab :arm :x 'a' 'b' 0.5").apply(df)
    assert out.count() == 1


def test_textrank_keywords_hub_word_wins(spark):
    from wrangler_spark.datapipe import text as t

    # "engine" co-occurs with everything; the one-off "quiet corner"
    # pair sits below min_count and must not enter the graph at all
    # (an isolated 2-node island would otherwise concentrate rank —
    # the standard PageRank-on-components caveat)
    docs = [
        ("spark engine shuffles data",),
        ("engine data pipelines scale",),
        ("shuffles scale engine pipelines",),
    ] * 6 + [("quiet corner",)]
    df = spark.createDataFrame(docs, "text string")
    got = t.textrank_keywords(df, "text", k=5, min_count=2).collect()
    words = [r["word"] for r in got]
    assert words[0] == "engine"  # the hub outranks its neighbors
    assert "quiet" not in words and "corner" not in words
    # ordering contract: pagerank DESC, word ASC
    scores = [r["pagerank"] for r in got]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="k and min_count"):
        t.textrank_keywords(df, "text", k=0)


def test_textrank_filters_stopwords_and_short(spark):
    from wrangler_spark.datapipe import text as t

    df = spark.createDataFrame(
        [("the of and a engine to engine data",)] * 8, "text string")
    got = t.textrank_keywords(
        df, "text", k=10, min_count=2, min_word_len=3).collect()
    words = {r["word"] for r in got}
    assert "the" not in words and "of" not in words
    assert "engine" in words and "data" in words


def test_textrank_undirected_canonicalization_and_self_loops(spark):
    from wrangler_spark.datapipe import text as t

    # 3x "alpha beta" + 3x "beta alpha": the UNDIRECTED co-occurrence
    # count is 6, so min_count=5 must keep the edge (directional
    # counting would see two sub-threshold 3s and drop it)
    docs = [("alpha beta",)] * 3 + [("beta alpha",)] * 3
    df = spark.createDataFrame(docs, "text string")
    got = t.textrank_keywords(df, "text", k=5, min_count=5).collect()
    assert {r["word"] for r in got} == {"alpha", "beta"}

    # a repeated word must not rank via a self-loop: "echo echo" gives
    # only self-pairs, which are dropped -> empty graph
    dfs = spark.createDataFrame([("echo echo",)] * 8, "text string")
    assert t.textrank_keywords(dfs, "text", k=5, min_count=2).count() == 0


def test_textrank_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("alpha beta alpha beta",)] * 5, "text string")
    out = Pipeline.compile("textrank :text 3 2").apply(df)
    assert out.count() <= 3


def test_spearman_reference_and_monotone_invariance(spark):
    from wrangler_spark.datapipe import numeric
    from collections import Counter
    import math
    import random

    random.seed(21)
    rows = [(round(random.gauss(0, 1), 2),) for _ in range(200)]
    rows = [(x, round(x ** 3 + random.gauss(0, 0.4), 2)) for (x,) in rows]
    df = spark.createDataFrame(rows, "a double, b double")
    got = numeric.spearman_corr(df, "a", "b").collect()[0]

    def ranks(vals):
        cnt = Counter(vals)
        cum, mr = 0, {}
        for v in sorted(cnt):
            mr[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return [mr[v] for v in vals]

    xa = ranks([round(a * 1e6) for a, _ in rows])
    yb = ranks([round(b * 1e6) for _, b in rows])
    n = len(rows)
    sx, sy = sum(xa), sum(yb)
    sxy = sum(p * q for p, q in zip(xa, yb))
    sxx = sum(p * p for p in xa)
    syy = sum(q * q for q in yb)
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert got["rho"] == round(rho, 6) and got["n"] == n

    # strictly monotone transform leaves Spearman EXACTLY unchanged
    # (ranks identical) — the property Pearson lacks. atan, not exp:
    # exp squashes the negative tail below micro resolution, MAKING
    # ties; atan keeps this fixture's 2dp-spaced values distinct
    df2 = df.selectExpr("a", "atan(b) as b")
    got2 = numeric.spearman_corr(df2, "a", "b").collect()[0]
    assert got2["rho"] == got["rho"]


def test_spearman_perfect_ties_and_guards(spark):
    from wrangler_spark.datapipe import numeric

    df = spark.createDataFrame(
        [(float(i), float(2 * i)) for i in range(10)], "a double, b double")
    assert numeric.spearman_corr(df, "a", "b").collect()[0]["rho"] == 1.0
    df = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(10)], "a double, b double")
    assert numeric.spearman_corr(df, "a", "b").collect()[0]["rho"] == -1.0
    # constant column: zero rank variance -> NULL
    df = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "a double, b double")
    assert numeric.spearman_corr(df, "a", "b").collect()[0]["rho"] is None
    with pytest.raises(ValueError, match="distinct values"):
        numeric.spearman_corr(
            spark.createDataFrame(
                [(float(i), float(i)) for i in range(10)],
                "a double, b double"),
            "a", "b", max_cells=3)
    with pytest.raises(ValueError, match="no complete rows"):
        numeric.spearman_corr(
            spark.createDataFrame([(1.0, None)], "a double, b double"),
            "a", "b")


def test_spearman_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 15.0)], "a double, b double")
    out = Pipeline.compile("spearman :a :b").apply(df)
    assert out.collect()[0]["n"] == 3


def test_attribution_first_last_touch(spark):
    from wrangler_spark.datapipe import events as ev

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view", "A"),
        (2, 1, "2024-01-01 00:01:00", "click", "B"),
        (3, 1, "2024-01-01 00:02:00", "purchase", None),
        (4, 1, "2024-01-01 00:03:00", "view", "C"),
        (5, 1, "2024-01-01 00:04:00", "purchase", None),
        (6, 2, "2024-01-01 00:00:30", "purchase", None),  # organic: no touch
        (7, 3, "2024-01-01 00:00:10", "error", "X"),      # non-touch type
        (8, 3, "2024-01-01 00:00:20", "purchase", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, u long, ts string, etype string, ch string")
    got = ev.attribution(
        df, "u", "ts", "etype", "purchase", ["view", "click"],
        channel_col="ch", order_col="event_id",
    ).collect()
    by = {(r["user"], str(r["ts"])): r for r in got}
    assert len(got) == 4
    r1 = by[(1, "2024-01-01 00:02:00")]
    assert (r1["first_touch"], r1["last_touch"], r1["n_touches"]) == ("A", "B", 2)
    r2 = by[(1, "2024-01-01 00:04:00")]
    assert (r2["first_touch"], r2["last_touch"], r2["n_touches"]) == ("A", "C", 3)
    organic = by[(2, "2024-01-01 00:00:30")]
    assert organic["first_touch"] is None and organic["n_touches"] == 0
    # an 'error' event is neither touch nor conversion channel source
    r3 = by[(3, "2024-01-01 00:00:20")]
    assert r3["first_touch"] is None and r3["n_touches"] == 0

    import pytest as _pt

    with _pt.raises(ValueError, match="touch type"):
        ev.attribution(df, "u", "ts", "etype", "purchase", [])


def test_rank_transform_midranks(spark):
    from wrangler_spark.datapipe import numeric

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0), (5, None)],
        "id long, v double")
    got = {r["id"]: r["v_rank"]
           for r in numeric.rank_transform(df, "v").collect()}
    assert got == {1: 1.0, 2: 2.5, 3: 2.5, 4: 4.0, 5: None}
    with pytest.raises(ValueError, match="distinct values"):
        numeric.rank_transform(df, "v", max_cells=2)
