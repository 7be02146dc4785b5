"""Unit tests for the TPC-H-flavored relational operators added in round 5
(Q6 forecast revenue, Q14 promo share, Q10 top return customers, Q13 order
count distribution, Q18 large orders, Q19 discounted revenue).

Each is verified against an independent brute-force pandas formulation on a
small randomized synthetic star schema (the DuckDB parity check on the real
testdata lives in test_oracle_conformance.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _synthetic(seed=7, n_li=4000, n_orders=900, n_cust=120, n_part=60):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("1995-01-01").value // 1000
    span = pd.Timestamp("2001-01-01").value // 1000 - base
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            # leave some customers order-less for the Q13 zero branch
            "o_custkey": rng.integers(0, n_cust - 10, n_orders).astype(
                np.int64
            ),
            "o_orderdate": pd.to_datetime(
                base + rng.integers(0, span, n_orders), unit="us"
            ).astype("datetime64[us]"),
            "o_totalprice": np.round(
                rng.uniform(100, 500_000, n_orders), 2
            ),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_li).astype(np.int64),
            "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
            "l_quantity": np.round(rng.uniform(1, 50, n_li), 0),
            "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_returnflag": rng.choice(["R", "N", "A"], n_li),
            "l_shipdate": pd.to_datetime(
                base + rng.integers(0, span, n_li), unit="us"
            ).astype("datetime64[us]"),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int64),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_brand": rng.choice(
                ["Brand#12", "Brand#23", "Brand#34", "Brand#55"], n_part
            ),
            "p_type": rng.choice(
                ["PROMO", "ECONOMY", "STANDARD"], n_part
            ),
            "p_size": rng.integers(1, 51, n_part).astype(np.int64),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
            "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        }
    )
    return li, orders, cust, part, nation


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df).repartition(5)


def _cents(x):
    return np.rint(np.asarray(x) * 100).astype(np.int64)


def test_forecast_revenue_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import forecast_revenue

    li, *_ = _synthetic()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000
    out = forecast_revenue(
        _ds(li), date_lo_us=lo, date_hi_us=hi
    ).to_pandas()

    ship = li["l_shipdate"].astype("int64")  # datetime64[us] → µs
    dc = _cents(li["l_discount"])
    keep = (
        (ship >= lo)
        & (ship < hi)
        & (dc >= 3)
        & (dc <= 5)
        & (li["l_quantity"] < 24)
    ).to_numpy()
    want = float((_cents(li["l_extendedprice"])[keep] * dc[keep]).sum()) / 1e4
    assert len(out) == 1
    assert out["n_items"].iloc[0] == int(keep.sum())
    assert out["revenue"].iloc[0] == pytest.approx(want, abs=1e-9)


def test_promo_share_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        promo_revenue_share,
    )

    li, _, _, part, _ = _synthetic()
    out = promo_revenue_share(_ds(li), _ds(part)).to_pandas()

    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    u = _cents(j["l_extendedprice"]) * (100 - _cents(j["l_discount"]))
    promo = (j["p_type"] == "PROMO").to_numpy()
    pu, tu = int(u[promo].sum()), int(u.sum())
    assert len(out) == 1
    assert out["promo_revenue"].iloc[0] == pytest.approx(pu / 1e4)
    assert out["total_revenue"].iloc[0] == pytest.approx(tu / 1e4)
    assert out["promo_share"].iloc[0] == pytest.approx(float(pu) / float(tu))


def test_top_return_customers_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        top_return_customers,
    )

    li, orders, cust, _, nation = _synthetic()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000
    out = top_return_customers(
        _ds(li),
        _ds(orders),
        _ds(cust),
        nation,
        date_lo_us=lo,
        date_hi_us=hi,
        k=15,
        num_partitions=4,
    ).to_pandas()

    j = li[li["l_returnflag"] == "R"].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    od = j["o_orderdate"].astype("int64")  # datetime64[us] → µs
    j = j[(od >= lo) & (od < hi)].copy()
    j["u"] = _cents(j["l_extendedprice"]) * (100 - _cents(j["l_discount"]))
    rev = j.groupby("o_custkey")["u"].sum().reset_index()
    rev = rev.merge(cust, left_on="o_custkey", right_on="c_custkey")
    rev = rev.sort_values(
        ["u", "c_custkey"], ascending=[False, True]
    ).head(15)
    assert list(out["c_custkey"]) == list(rev["c_custkey"])
    np.testing.assert_allclose(
        out["revenue"].to_numpy(), rev["u"].to_numpy() / 1e4
    )
    nm = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    assert list(out["n_name"]) == [nm[k] for k in rev["c_nationkey"]]


def test_order_count_distribution_includes_zero(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        order_count_distribution,
    )

    li, orders, cust, _, _ = _synthetic()
    out = (
        order_count_distribution(_ds(cust), _ds(orders), num_partitions=4)
        .to_pandas()
        .sort_values("c_count")
        .reset_index(drop=True)
    )

    per = orders.groupby("o_custkey").size()
    counts = cust["c_custkey"].map(per).fillna(0).astype(np.int64)
    want = (
        counts.value_counts()
        .rename_axis("c_count")
        .reset_index(name="custdist")
        .sort_values("c_count")
        .reset_index(drop=True)
    )
    assert (counts == 0).sum() > 0, "fixture must exercise the zero branch"
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_large_orders_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import large_orders

    li, orders, cust, _, _ = _synthetic()
    thr, k = 150.0, 12
    out = large_orders(
        _ds(li), _ds(orders), _ds(cust), qty_threshold=thr, k=k,
        num_partitions=4,
    ).to_pandas()

    q = (
        li.assign(q=np.rint(li["l_quantity"]).astype(np.int64))
        .groupby("l_orderkey")["q"]
        .sum()
    )
    big = q[q > thr].reset_index().rename(columns={"q": "sum_qty"})
    j = big.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j["cents"] = _cents(j["o_totalprice"])
    j = j.sort_values(
        ["cents", "o_orderkey"], ascending=[False, True]
    ).head(k)
    assert list(out["o_orderkey"]) == list(j["o_orderkey"])
    assert list(out["sum_qty"]) == list(j["sum_qty"])
    assert list(out["c_custkey"]) == list(j["c_custkey"])


def test_discounted_revenue_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        _Q19_SPECS,
        discounted_revenue,
    )

    li, _, _, part, _ = _synthetic()
    out = discounted_revenue(_ds(li), _ds(part)).to_pandas()

    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    keep = np.zeros(len(j), dtype=bool)
    for b, qlo, qhi, slo, shi in _Q19_SPECS:
        keep |= (
            (j["p_brand"] == b)
            & (j["l_quantity"] >= qlo)
            & (j["l_quantity"] <= qhi)
            & (j["p_size"] >= slo)
            & (j["p_size"] <= shi)
        ).to_numpy()
    u = _cents(j["l_extendedprice"]) * (100 - _cents(j["l_discount"]))
    assert keep.sum() > 0, "fixture must select some rows"
    assert len(out) == 1
    assert out["n_items"].iloc[0] == int(keep.sum())
    assert out["revenue"].iloc[0] == pytest.approx(
        float(u[keep].sum()) / 1e4
    )


def _synthetic_q7(seed=11, n_li=3000, n_orders=600, n_cust=90, n_supp=40):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("1995-01-01").value // 1000
    span = pd.Timestamp("1999-01-01").value // 1000 - base
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_orders).astype(np.int64),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(900, 90_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_shipdate": pd.to_datetime(
                base + rng.integers(0, span, n_li), unit="us"
            ).astype("datetime64[us]"),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_nationkey": rng.integers(0, 6, n_cust).astype(np.int64),
        }
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_nationkey": rng.integers(0, 6, n_supp).astype(np.int64),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(6, dtype=np.int64)),
            "n_name": pa.array([f"N{i}" for i in range(6)]),
        }
    )
    return li, orders, cust, supp, nation


def test_volume_shipping_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import volume_shipping

    li, orders, cust, supp, nation = _synthetic_q7()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000
    got = (
        volume_shipping(
            _ds(li), _ds(orders), _ds(cust), _ds(supp), nation,
            nation_a="N1", nation_b="N4",
            date_lo_us=lo, date_hi_us=hi, num_partitions=3,
        )
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )

    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    sd = j["l_shipdate"].astype("int64")
    names = {i: f"N{i}" for i in range(6)}
    sn = j["s_nationkey"].map(names)
    cn = j["c_nationkey"].map(names)
    keep = (
        (sd >= lo) & (sd < hi)
        & (((sn == "N1") & (cn == "N4")) | ((sn == "N4") & (cn == "N1")))
    )
    jj = j[keep].copy()
    jj["u"] = _cents(jj["l_extendedprice"]) * (
        100 - np.rint(jj["l_discount"].to_numpy() * 100).astype(np.int64)
    )
    jj["supp_nation"] = sn[keep]
    jj["cust_nation"] = cn[keep]
    jj["l_year"] = jj["l_shipdate"].dt.year.astype(np.int64)
    want = (
        jj.groupby(["supp_nation", "cust_nation", "l_year"])
        .agg(u=("u", "sum"), n=("u", "size"))
        .reset_index()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["n_items"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(
        got["revenue"].to_numpy(), want["u"].to_numpy() / 10000.0
    )


def test_small_quantity_revenue_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        small_quantity_revenue,
    )

    li, orders, cust, part, nation = _synthetic()
    got = small_quantity_revenue(
        _ds(li), _ds(part), brand="Brand#23", num_partitions=3
    ).to_pandas()

    sel = part[part["p_brand"] == "Brand#23"]
    j = li.merge(sel, left_on="l_partkey", right_on="p_partkey")
    qc = _cents(j["l_quantity"])
    g = (
        pd.DataFrame({"pk": j["l_partkey"], "qc": qc})
        .groupby("pk")
        .agg(sq=("qc", "sum"), cnt=("qc", "size"))
    )
    sq = g.loc[j["l_partkey"], "sq"].to_numpy()
    cnt = g.loc[j["l_partkey"], "cnt"].to_numpy()
    small = qc * 5 * cnt < 1 * sq
    want_u = int(_cents(j["l_extendedprice"])[small].sum())
    assert int(got["n_items"][0]) == int(small.sum())
    assert abs(got["avg_yearly"][0] - round(want_u / 100.0 / 7.0, 6)) < 1e-6


def test_sales_opportunity_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        sales_opportunity,
    )

    li, orders, cust, part, nation = _synthetic()
    cust = cust.copy()
    cust["c_mktsegment"] = np.where(
        cust["c_custkey"] % 3 == 0, "BUILDING", "MACHINERY"
    )
    since = pd.Timestamp("1999-01-01").value // 1000
    got = (
        sales_opportunity(
            _ds(cust),
            _ds(orders[["o_custkey", "o_orderdate"]]),
            since_us=since,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )

    cents = _cents(cust["c_acctbal"])
    pos = cents[cents > 0]
    recent = set(
        orders.loc[
            orders["o_orderdate"].astype("int64") >= since, "o_custkey"
        ]
    )
    keep = (cents * len(pos) > pos.sum()) & ~cust["c_custkey"].isin(recent)
    kk = cust[keep]
    want = (
        pd.DataFrame(
            {"seg": kk["c_mktsegment"], "cents": cents[keep.to_numpy()]}
        )
        .groupby("seg")
        .agg(cents=("cents", "sum"), n=("cents", "size"))
        .reset_index()
        .sort_values("seg")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["n_custs"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(
        got["total_acctbal"].to_numpy(), want["cents"].to_numpy() / 100.0
    )


def test_market_share_brute_force(ray_session):
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import market_share

    rng = np.random.default_rng(11)
    n_li, n_orders, n_cust, n_supp, n_part = 5000, 1000, 150, 40, 80
    base = pd.Timestamp("1995-06-01").value // 1000
    span = pd.Timestamp("1999-01-01").value // 1000 - base
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_li).astype(np.int64),
            "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(900, 90_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_orders).astype(np.int64),
            "o_orderdate": pd.to_datetime(
                base + rng.integers(0, span, n_orders), unit="us"
            ).astype("datetime64[us]"),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_nationkey": rng.integers(0, 6, n_cust).astype(np.int64),
        }
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_nationkey": rng.integers(0, 6, n_supp).astype(np.int64),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_type": rng.choice(["ECONOMY", "PROMO", "LARGE"], n_part),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(6, dtype=np.int64)),
            "n_name": pa.array([f"N{i}" for i in range(6)]),
            "n_regionkey": pa.array(
                np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
            ),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(3, dtype=np.int64)),
            "r_name": pa.array(["ASIA", "EUROPE", "AFRICA"]),
        }
    )
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000

    got = (
        market_share(
            ray.data.from_pandas(li),
            ray.data.from_pandas(orders),
            ray.data.from_pandas(cust),
            ray.data.from_pandas(supp),
            ray.data.from_pandas(part),
            nation,
            region,
            nation="N1",
            region="ASIA",
            p_type="ECONOMY",
            date_lo_us=lo,
            date_hi_us=hi,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )

    # independent brute force: one big pandas merge chain
    j = (
        li.merge(part[part.p_type == "ECONOMY"], left_on="l_partkey",
                 right_on="p_partkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[
        (j.o_orderdate.astype("int64") >= lo)
        & (j.o_orderdate.astype("int64") < hi)
        & (j.c_nationkey.isin([0, 1, 2]))  # ASIA nations
    ]
    u = (
        np.rint(j.l_extendedprice.to_numpy() * 100).astype(np.int64)
        * (100 - np.rint(j.l_discount.to_numpy() * 100).astype(np.int64))
    )
    yr = j.o_orderdate.dt.year.to_numpy()
    isn = (j.s_nationkey == 1).to_numpy()
    want = (
        pd.DataFrame({"o_year": yr, "nu": np.where(isn, u, 0), "tu": u})
        .groupby("o_year")
        .sum()
        .reset_index()
    )
    assert list(got.o_year) == list(want.o_year)
    np.testing.assert_allclose(
        got.nation_revenue, want.nu / 10000.0, atol=1e-9
    )
    np.testing.assert_allclose(
        got.total_revenue, want.tu / 10000.0, atol=1e-9
    )
    np.testing.assert_allclose(
        got.mkt_share, want.nu / want.tu, atol=1e-12
    )


def _synthetic6(seed=11, n_li=5000, n_orders=800, n_part=80, n_supp=12):
    """Star schema for the Q2/Q9/Q11/Q12/Q20/Q21 shapes: adds suppkey,
    supplier, order priority/status, and part names; includes acctbal TIES
    (two suppliers share a balance) to exercise the Q2 tie-break."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("1995-01-01").value // 1000
    span = pd.Timestamp("2001-01-01").value // 1000 - base
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_orders, n_li).astype(np.int64),
            "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
            "l_quantity": np.round(rng.uniform(1, 50, n_li), 0),
            "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_returnflag": rng.choice(["R", "N", "A"], n_li),
            "l_shipdate": pd.to_datetime(
                base + rng.integers(0, span, n_li), unit="us"
            ).astype("datetime64[us]"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_orderdate": pd.to_datetime(
                base + rng.integers(0, span // 2, n_orders), unit="us"
            ).astype("datetime64[us]"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"], n_orders
            ),
            "o_orderstatus": rng.choice(["F", "O", "P"], n_orders),
        }
    )
    bal = np.round(rng.uniform(-999, 9999, n_supp), 2)
    bal[3] = bal[7]  # forced tie → Q2 must pick min(suppkey)=3 of the pair
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_acctbal": bal,
            "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int64),
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": rng.choice(
                ["red bolt", "blue bolt", "green widget", "small rod"],
                n_part,
            ),
            "p_brand": rng.choice(["Brand#12", "Brand#23"], n_part),
            "p_type": rng.choice(["PROMO", "ECONOMY", "STANDARD"], n_part),
            "p_size": rng.integers(1, 51, n_part).astype(np.int64),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int64)),
            "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        }
    )
    return li, orders, supplier, part, nation


def test_min_cost_supplier_brute_force_with_ties(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import min_cost_supplier

    li, orders, supplier, part, nation = _synthetic6()
    out = (
        min_cost_supplier(
            _ds(li[["l_partkey", "l_suppkey"]]),
            _ds(supplier),
            _ds(part),
            nation,
            p_type="ECONOMY",
            max_size=40,
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )

    supply = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    cand = supply.merge(
        supplier, left_on="l_suppkey", right_on="s_suppkey"
    )
    cand["ck"] = _cents(cand["s_acctbal"]) * (1 << 24) - cand["s_suppkey"]
    best = cand.loc[cand.groupby("l_partkey")["ck"].idxmax()]
    keep_parts = part[(part.p_type == "ECONOMY") & (part.p_size <= 40)]
    want = best.merge(
        keep_parts, left_on="l_partkey", right_on="p_partkey"
    ).sort_values("p_partkey")
    assert len(out) == len(want)
    assert (out["p_partkey"].to_numpy() == want["p_partkey"].to_numpy()).all()
    assert (out["s_name"].to_numpy() == want["s_name"].to_numpy()).all()
    # the forced acctbal tie resolved to the smaller suppkey wherever the
    # tied pair were both candidates for a part
    tied = cand[cand.s_suppkey.isin([3, 7])]
    both = tied.groupby("l_partkey")["s_suppkey"].nunique()
    for pk in both[both == 2].index:
        row = out[out.p_partkey == pk]
        if len(row) and row["s_acctbal"].iloc[0] == supplier.s_acctbal[3]:
            assert row["s_name"].iloc[0] == "Supplier#000000003"


def test_product_type_profit_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        product_type_profit,
    )

    li, orders, supplier, part, nation = _synthetic6()
    out = product_type_profit(
        _ds(li), _ds(orders[["o_orderkey", "o_orderdate"]]),
        _ds(supplier[["s_suppkey", "s_nationkey"]]),
        _ds(part[["p_partkey", "p_name"]]), nation,
        name_substr="bolt", num_partitions=3,
    ).to_pandas()

    j = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(supplier, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.p_name.str.contains("bolt")]
    j["u"] = _cents(j.l_extendedprice) * (100 - _cents(j.l_discount))
    j["o_year"] = j.o_orderdate.dt.year.astype(np.int64)
    j["n_name"] = j.s_nationkey.map(lambda k: f"NATION_{k:02d}")
    want = (
        j.groupby(["n_name", "o_year"])["u"].sum().reset_index()
    )
    merged = out.merge(want, on=["n_name", "o_year"], how="outer")
    assert len(merged) == len(want) == len(out)
    assert np.allclose(
        merged["sum_profit"], merged["u"].astype(np.float64) / 1e4
    )


def test_important_parts_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import important_parts

    li, *_ = _synthetic6()
    out = important_parts(_ds(li), num=5, den=4).to_pandas()

    u = pd.DataFrame(
        {
            "pk": li.l_partkey,
            "u": _cents(li.l_extendedprice) * (100 - _cents(li.l_discount)),
        }
    ).groupby("pk")["u"].sum()
    thr = (5 * int(u.sum())) // (4 * len(u))
    want = u[u > thr]
    assert sorted(out["l_partkey"]) == sorted(want.index)
    got = out.set_index("l_partkey")["value"].sort_index()
    assert np.allclose(got.to_numpy(), (want.sort_index() / 1e4).to_numpy())


def test_late_shipment_counts_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        late_shipment_counts,
    )

    li, orders, *_ = _synthetic6()
    out = late_shipment_counts(
        _ds(li[["l_orderkey", "l_returnflag", "l_shipdate"]]),
        _ds(orders[["o_orderkey", "o_orderdate", "o_orderpriority"]]),
        late_days=90, num_partitions=3,
    ).to_pandas().set_index("l_returnflag").sort_index()

    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = j[
        j.l_shipdate.astype("int64")
        > j.o_orderdate.astype("int64") + 90 * 86_400_000_000
    ]
    crit = late.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    want_hi = late[crit].groupby("l_returnflag").size()
    want_lo = late[~crit].groupby("l_returnflag").size()
    for f in out.index:
        assert out.loc[f, "high_line_count"] == want_hi.get(f, 0)
        assert out.loc[f, "low_line_count"] == want_lo.get(f, 0)


def test_part_promotion_brute_force_and_empty(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import (
        part_promotion_suppliers,
    )

    li, orders, supplier, part, nation = _synthetic6()
    out = part_promotion_suppliers(
        _ds(li[["l_partkey", "l_suppkey", "l_quantity"]]),
        _ds(supplier[["s_suppkey", "s_name"]]),
        _ds(part[["p_partkey", "p_name"]]),
        name_substr="bolt", num=1, den=5, num_partitions=3,
    ).to_pandas()

    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[j.p_name.str.contains("bolt")]
    j["qc"] = _cents(j.l_quantity)
    pq_ = j.groupby(["l_partkey", "l_suppkey"])["qc"].sum().reset_index()
    tot = pq_.groupby("l_partkey")["qc"].sum().rename("tq").reset_index()
    m = pq_.merge(tot, on="l_partkey")
    want = sorted(m[m.qc * 5 > m.tq].l_suppkey.unique())
    assert sorted(out["s_suppkey"]) == want

    # degenerate threshold (no supplier exceeds 100%) → typed empty result
    empty = part_promotion_suppliers(
        _ds(li[["l_partkey", "l_suppkey", "l_quantity"]]),
        _ds(supplier[["s_suppkey", "s_name"]]),
        _ds(part[["p_partkey", "p_name"]]),
        name_substr="bolt", num=1, den=1, num_partitions=3,
    )
    assert empty.count() == 0
    # the short-circuit keeps a TYPED schema (Ray's to_pandas drops
    # columns on empty datasets, so assert on the dataset schema)
    assert empty.schema().names == ["s_suppkey", "s_name"]


def test_waiting_suppliers_brute_force(ray_session):
    from asterixdb_analytics_ray.pipelines.relational import waiting_suppliers

    li, orders, supplier, part, nation = _synthetic6()
    out = waiting_suppliers(
        _ds(li[["l_orderkey", "l_suppkey", "l_shipdate"]]),
        _ds(orders[["o_orderkey", "o_orderdate", "o_orderstatus"]]),
        _ds(supplier[["s_suppkey", "s_name"]]),
        late_days=60, num_partitions=3,
    ).to_pandas()

    j = li.merge(
        orders[orders.o_orderstatus == "F"],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    j["late"] = (
        j.l_shipdate.astype("int64")
        > j.o_orderdate.astype("int64") + 60 * 86_400_000_000
    ).astype(int)
    pairs = (
        j.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index()
    )
    po = pairs.groupby("l_orderkey").agg(
        n_supp=("late", "size"), n_late=("late", "sum")
    )
    q = pairs.merge(po, on="l_orderkey")
    q = q[(q.late == 1) & (q.n_supp > 1) & (q.n_late == 1)]
    want = q.groupby("l_suppkey").size()
    got = out.set_index("s_name")["numwait"]
    assert len(got) == len(want)
    for sk, n in want.items():
        assert got[f"Supplier#{sk:09d}"] == n


def test_maintained_summary_equals_recompute(ray_session):
    """The signed-partial maintained result equals a direct recompute over
    (base − deletes) ∪ inserts, and a group fully deleted drops out."""
    import ray.data

    from asterixdb_analytics_ray.pipelines.relational import (
        maintained_pricing_summary, pricing_summary,
    )

    li, orders, *_ = _synthetic6(seed=29, n_li=3000)
    li = li.copy()
    li["l_orderkey"] = np.arange(len(li), dtype=np.int64)
    # make one (flag, status) group exist ONLY in deleted rows
    li["l_linestatus"] = np.where(
        li.l_orderkey % 10 == 3, "D", "O"
    )
    ds = _ds(li)

    def ins_f(df):
        return df[df.l_orderkey % 10 == 7]

    ins = _ds(li[li.l_orderkey % 10 == 7])
    got = (
        maintained_pricing_summary(ds, ins, cutoff_us=2**62)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )

    manual = pd.concat(
        [li[li.l_orderkey % 10 != 3], li[li.l_orderkey % 10 == 7]]
    )
    want = (
        pricing_summary(_ds(manual), cutoff_us=2**62)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert got.shape == want.shape
    assert (got["sum_qty"].to_numpy() == want["sum_qty"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["sum_disc_price"], want["sum_disc_price"])
    assert "D" not in set(got["l_linestatus"])  # fully-deleted group gone
