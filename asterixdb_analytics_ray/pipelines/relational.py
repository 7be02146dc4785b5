"""Relational analytics over the TPC-H-style tables (lineitem / orders /
customer / nation) — the warehouse-flavored pipelines a data platform runs
next to the corpus/graph work, expressed Ray-Data-first.

Exactness contract: every money column in the generator carries two
decimals, so each aggregate folds EXACT integer units (cents for prices,
1e-4 units for the discounted extension) inside per-batch partials; the
global sums stay far below 2^53 at any scale this repo targets (at sf0.1:
Σcents ≈ 6e12, Σdisc-units ≈ 6e14 vs 9.0e15), and the few closing
divisions are mirrored op-for-op by the SQL oracles, so results are
deterministic and hash-identical — no float summation anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_CUTOFF_US = np.int64(
    int(pd.Timestamp("1998-09-02").value // 1000)
)  # TPC-H Q1's DATE '1998-12-01' - 90 days


def pricing_summary(
    lineitem: ray.data.Dataset, cutoff_us: int | None = None
) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary: per (returnflag, linestatus) over
    rows with ``l_shipdate ≤ cutoff``: Σqty, Σbase price, Σdiscounted
    price, row count, and the two averages.

    → (l_returnflag, l_linestatus, sum_qty: int64, sum_base_price,
    sum_disc_price, n: int64, avg_qty, avg_price). One map-side partial
    pass (exact integer units) + one groups-bounded shuffle."""
    from ray.data.aggregate import Sum

    cut = np.int64(cutoff_us if cutoff_us is not None else _CUTOFF_US)

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        keep = ship <= cut
        qty = np.rint(t["l_quantity"].to_numpy()[keep]).astype(np.int64)
        cents = np.rint(t["l_extendedprice"].to_numpy()[keep] * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy()[keep] * 100).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(
                    zero_copy_only=False
                )[keep],
                "l_linestatus": t["l_linestatus"].to_numpy(
                    zero_copy_only=False
                )[keep],
                "q": qty,
                "c": cents,
                "u": cents * (100 - dcents),  # 1e-4 units, exact
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_q=("q", "sum"),
                sum_c=("c", "sum"),
                sum_u=("u", "sum"),
                n=("q", "size"),
            )
            .reset_index()
        )
        for col in ["sum_q", "sum_c", "sum_u", "n"]:
            g[col] = g[col].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_q", alias_name="sum_q"),
            Sum("sum_c", alias_name="sum_c"),
            Sum("sum_u", alias_name="sum_u"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        q = t["sum_q"].to_numpy().astype(np.int64)
        c = t["sum_c"].to_numpy().astype(np.float64)
        u = t["sum_u"].to_numpy().astype(np.float64)
        n = t["n"].to_numpy().astype(np.int64)
        nd = n.astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": q,
                "sum_base_price": c / 100.0,
                "sum_disc_price": u / 10000.0,
                "n": n,
                # the oracle's exact double-op order
                "avg_qty": q.astype(np.float64) / nd,
                "avg_price": c / 100.0 / nd,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def nation_revenue(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation_table: pa.Table,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Revenue rollup per customer nation: orders ⨝ customer on custkey
    (Ray Data's distributed HASH JOIN — the orders side is the big one),
    then the 25-row nation dictionary applied as a BROADCAST lookup
    inside the aggregate pass (never a shuffle join for the tiny side).

    → (n_name, n_orders: int64, revenue) with revenue folded in exact
    cents."""
    from ray.data.aggregate import Sum

    nmap = {}
    for k, v in zip(
        nation_table["n_nationkey"].to_pylist(),
        nation_table["n_name"].to_pylist(),
    ):
        nmap[int(k)] = v
    nref = ray.put(nmap)

    joined = orders.select_columns(["o_custkey", "o_totalprice"]).join(
        customer.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"nk": nk, "cents": cents})
        g = (
            df.groupby("nk", sort=False)
            .agg(cents=("cents", "sum"), n=("cents", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "n_name": pa.array([nm[int(k)] for k in g["nk"]]),
                "cents": g["cents"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t["n_name"],
                "n_orders": t["n"].to_numpy().astype(np.int64),
                "revenue": t["cents"].to_numpy().astype(np.float64) / 100.0,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_Q3_DATE_US = np.int64(int(pd.Timestamp("1998-01-01").value // 1000))


def shipping_priority(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    segment: str = "BUILDING",
    date_us: int | None = None,
    k: int = 10,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """TPC-H Q3-style shipping priority: top-k unshipped orders of a
    market segment by discounted revenue — the big-big join showcase.

    → (l_orderkey, revenue, o_orderdate_us) ordered (revenue desc,
    orderkey asc; revenue is an exact 1e-4-unit integer before the one
    closing division, so ties are deterministic).

    Plan: customer is filtered to the segment BEFORE its hash join with
    the date-filtered orders (the small-after-filter side never ships
    full), then that result joins the date-filtered lineitem — two Ray
    Data distributed hash joins, revenue folded as exact-int per-batch
    partials, a groups-bounded aggregate, sort + limit."""
    from ray.data.aggregate import Max, Sum

    cut = np.int64(date_us if date_us is not None else _Q3_DATE_US)

    def keep_cust(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["c_mktsegment"], segment)).select(
            ["c_custkey"]
        )

    def keep_orders(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        return t.filter(pa.array(od < cut)).select(
            ["o_orderkey", "o_custkey", "o_orderdate"]
        )

    def keep_li(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].cast(pa.int64()).to_numpy()
        t = t.filter(pa.array(sd > cut))
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "u": cents * (100 - dcents),
            }
        )

    co = orders.map_batches(keep_orders, batch_format="pyarrow").join(
        customer.map_batches(keep_cust, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    li = lineitem.map_batches(keep_li, batch_format="pyarrow")
    big = li.join(
        co,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def to_units(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "u": t["u"],
                "odate": t["o_orderdate"].cast(pa.int64()),
            }
        )

    agg = (
        big.map_batches(to_units, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("u", alias_name="u"), Max("odate", alias_name="odate"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].to_numpy().astype(np.int64),
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "o_orderdate_us": t["odate"].to_numpy().astype(np.int64),
                "u": t["u"],  # exact-int sort key
            }
        )

    out = (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["u", "l_orderkey"], descending=[True, False])
        .limit(k)
    )
    return out.select_columns(["l_orderkey", "revenue", "o_orderdate_us"])


def brand_volume(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """Per-brand shipped volume: lineitem ⨝ part on partkey (part is
    data-proportional, so a distributed hash join — not a broadcast),
    then a brands-bounded aggregate.

    → (p_brand, n_items: int64, sum_qty: int64, revenue) with revenue in
    exact cents."""
    from ray.data.aggregate import Sum

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "q": np.rint(t["l_quantity"].to_numpy()).astype(np.int64),
                "c": np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
                    np.int64
                ),
            }
        )

    joined = lineitem.map_batches(li_prep, batch_format="pyarrow").join(
        part.select_columns(["p_partkey", "p_brand"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_brand": t["p_brand"].to_numpy(zero_copy_only=False),
                "q": t["q"].to_numpy(),
                "c": t["c"].to_numpy(),
            }
        )
        g = (
            df.groupby("p_brand", sort=False)
            .agg(q=("q", "sum"), c=("c", "sum"), n=("q", "size"))
            .reset_index()
        )
        for col in ["q", "c", "n"]:
            g[col] = g[col].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("q", alias_name="q"),
            Sum("c", alias_name="c"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "n_items": t["n"].to_numpy().astype(np.int64),
                "sum_qty": t["q"].to_numpy().astype(np.int64),
                "revenue": t["c"].to_numpy().astype(np.float64) / 100.0,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def region_revenue(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation_table: pa.Table,
    region_table: pa.Table,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """Q5-flavored revenue per supplier REGION: lineitem ⨝ supplier on
    suppkey (supplier grows with the data → hash join), then the
    FIXED-cardinality nation (25) and region (5) dimensions applied as
    broadcast lookups inside the aggregate pass.

    → (r_name, n_items: int64, revenue) with revenue folded as exact
    1e-4 discounted units."""
    from ray.data.aggregate import Sum

    n2r = {
        int(nk): int(rk)
        for nk, rk in zip(
            nation_table["n_nationkey"].to_pylist(),
            nation_table["n_regionkey"].to_pylist(),
        )
    }
    rname = {
        int(rk): nm
        for rk, nm in zip(
            region_table["r_regionkey"].to_pylist(),
            region_table["r_name"].to_pylist(),
        )
    }
    lookup = {nk: rname[rk] for nk, rk in n2r.items()}
    lref = ray.put(lookup)

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_suppkey": t["l_suppkey"], "u": cents * (100 - dcents)}
        )

    joined = lineitem.map_batches(li_prep, batch_format="pyarrow").join(
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        lk = ray.get(lref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"nk": nk, "u": t["u"].to_numpy()})
        g = (
            df.groupby("nk", sort=False)
            .agg(u=("u", "sum"), n=("u", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "r_name": pa.array([lk[int(k)] for k in g["nk"]]),
                "u": g["u"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": t["r_name"],
                "n_items": t["n"].to_numpy().astype(np.int64),
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def inactive_customers(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    min_totalprice: float = 400_000.0,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Distributed ANTI JOIN: customers with NO order above
    ``min_totalprice`` → ``(c_custkey, c_name, c_acctbal)``.

    Plan: filter orders map-side, pre-dedup custkeys per batch (the
    combiner prune — the exchange then carries distinct keys per block,
    never order rows), close the distinct with one groupby, and LEFT OUTER
    join customer against the marked key set; the anti join is the
    null-marker filter. No side is ever broadcast — both scale with data.
    """
    import pyarrow.compute as pc

    thr = float(min_totalprice)

    def big_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.greater(t["o_totalprice"], thr))["o_custkey"]
        u = pc.unique(keys)
        return pa.table(
            {
                "o_custkey": u,
                "has_order": pa.array(
                    np.ones(len(u), dtype=np.int64), pa.int64()
                ),
            }
        )

    okeys = (
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(big_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "has_order": pa.array(
                        np.ones(len(t), dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    joined = customer.select_columns(
        ["c_custkey", "c_name", "c_acctbal"]
    ).join(
        okeys,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def anti(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["has_order"]))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
            }
        )

    return joined.map_batches(anti, batch_format="pyarrow")


def priority_return_counts(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Distributed SEMI JOIN (TPC-H Q4 shape): orders with at least one
    RETURNED lineitem (``l_returnflag = 'R'``), counted per
    ``o_orderpriority`` → ``(o_orderpriority, n_orders)``.

    The dual of ``inactive_customers``: filter lineitem map-side,
    per-batch distinct orderkeys (combiner prune), one-groupby distinct
    close, INNER join orders — the distinct step is what makes the join a
    semi join (each order matches at most once) — then a
    priorities-bounded count rollup.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def ret_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.equal(t["l_returnflag"], "R"))["l_orderkey"]
        return pa.table({"l_orderkey": pc.unique(keys)})

    lkeys = (
        lineitem.select_columns(["l_orderkey", "l_returnflag"])
        .map_batches(ret_keys, batch_format="pyarrow")
        .groupby("l_orderkey")
        .count()
        .select_columns(["l_orderkey"])
    )

    joined = orders.select_columns(["o_orderkey", "o_orderpriority"]).join(
        lkeys,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderpriority": t["o_orderpriority"].to_pylist()})
        g = df.groupby("o_orderpriority", sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "o_orderpriority": pa.array(g["o_orderpriority"]),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n_orders"))
    )

    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n_orders": t["n_orders"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )


_Y1996_US = np.int64(int(pd.Timestamp("1996-01-01").value // 1000))
_Y1997_US = np.int64(int(pd.Timestamp("1997-01-01").value // 1000))


def forecast_revenue(
    lineitem: ray.data.Dataset,
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    disc_lo_c: int = 3,
    disc_hi_c: int = 5,
    max_qty: float = 24.0,
) -> ray.data.Dataset:
    """TPC-H Q6-style revenue forecast: Σ(extendedprice · discount) over a
    shipdate year, a discount band, and a quantity cap — the pure
    map-side filter+fold showcase (ZERO shuffle beyond a constant-key
    close; only one 2-int row leaves each block).

    → one row (revenue, n_items: int64); revenue folded as exact
    cents·centi-discount (1e-4) units. Reference cost-shape analog: the
    scan+select+project single-stage jobs of the MR utility layer."""
    from ray.data.aggregate import Sum

    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(date_hi_us if date_hi_us is not None else _Y1997_US)
    dlo, dhi = np.int64(disc_lo_c), np.int64(disc_hi_c)
    qcap = float(max_qty)

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = t["l_quantity"].to_numpy()
        keep = (
            (ship >= lo)
            & (ship < hi)
            & (dcents >= dlo)
            & (dcents <= dhi)
            & (qty < qcap)
        )
        cents = np.rint(t["l_extendedprice"].to_numpy()[keep] * 100).astype(
            np.int64
        )
        u = int((cents * dcents[keep]).sum())
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "u": pa.array([u], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "n_items": t["n"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def promo_revenue_share(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    promo_type: str = "PROMO",
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """TPC-H Q14-style promotion share: the fraction of total discounted
    revenue carried by promo-typed parts. lineitem ⨝ part on partkey
    (both sides data-proportional → distributed hash join), then a
    constant-key fold of (promo units, total units).

    → one row (promo_revenue, total_revenue, promo_share) with both
    revenues folded in exact 1e-4 units and the share computed as ONE
    double division of the two exact ints (oracle mirrors op-for-op)."""
    from ray.data.aggregate import Sum

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_partkey": t["l_partkey"], "u": cents * (100 - dcents)}
        )

    joined = lineitem.map_batches(li_prep, batch_format="pyarrow").join(
        part.select_columns(["p_partkey", "p_type"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["u"].to_numpy()
        promo = pc.equal(t["p_type"], promo_type).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "pu": pa.array([int(u[promo].sum())], pa.int64()),
                "tu": pa.array([int(u.sum())], pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("pu", alias_name="pu"), Sum("tu", alias_name="tu"))
    )

    def finish(t: pa.Table) -> pa.Table:
        pu = t["pu"].to_numpy().astype(np.float64)
        tu = t["tu"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "promo_revenue": pu / 10000.0,
                "total_revenue": tu / 10000.0,
                "promo_share": pu / tu,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_return_customers(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation_table: pa.Table,
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    k: int = 20,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """TPC-H Q10-style returned-item report: revenue lost to returns per
    customer over an order-date window, top-k customers.

    → (c_custkey, c_name, c_acctbal, n_name, revenue) ordered (revenue
    desc, custkey asc) — the sort runs on the exact 1e-4-unit integer so
    ties are deterministic.

    Plan: lineitem filtered to returnflag='R' map-side (projected to
    (orderkey, units)), orders filtered to the date window map-side, hash
    join on orderkey, per-customer exact-unit partial, groupby sum — the
    aggregate output is customer-bounded, so the final customer join +
    25-row broadcast nation lookup + sort all run on a small table."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(date_hi_us if date_hi_us is not None else _Y1997_US)

    nmap = {
        int(nk): nm
        for nk, nm in zip(
            nation_table["n_nationkey"].to_pylist(),
            nation_table["n_name"].to_pylist(),
        )
    }
    nref = ray.put(nmap)

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "u": cents * (100 - dcents)}
        )

    def o_prep(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        t = t.filter(pa.array((od >= lo) & (od < hi)))
        return t.select(["o_orderkey", "o_custkey"])

    joined = lineitem.map_batches(li_prep, batch_format="pyarrow").join(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ck": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "u": t["u"].to_numpy(),
            }
        )
        g = df.groupby("ck", sort=False).agg(u=("u", "sum")).reset_index()
        return pa.table(
            {
                "c_custkey": g["ck"].to_numpy(np.int64),
                "u": g["u"].to_numpy(np.int64),
            }
        )

    rev = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("u", alias_name="u"))
    )

    withc = rev.join(
        customer.select_columns(
            ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
        ),
        join_type="inner",
        num_partitions=max(2, num_partitions // 4),
        on=("c_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["c_custkey"].to_numpy().astype(np.int64),
                "c_name": t["c_name"],
                "c_acctbal": t["c_acctbal"],
                "n_name": pa.array([nm[int(x)] for x in nk]),
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "u": t["u"],
            }
        )

    out = (
        withc.map_batches(finish, batch_format="pyarrow")
        .sort(["u", "c_custkey"], descending=[True, False])
        .limit(k)
    )
    return out.select_columns(
        ["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]
    )


def order_count_distribution(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q13-style customer distribution: how many customers placed
    exactly c orders, INCLUDING the zero-order customers (the left-outer
    null branch) → (c_count: int64, custdist: int64).

    Plan: per-batch partial order counts per custkey (combiner prune) →
    groupby sum → LEFT OUTER join customer → null-marker ⇒ 0 → per-batch
    partial histogram → counts-bounded groupby sum. Both exchanges carry
    combiner-pruned rows only."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def o_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ck": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
            }
        )
        g = df.groupby("ck", sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "o_custkey": g["ck"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    counts = (
        orders.select_columns(["o_custkey"])
        .map_batches(o_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n"))
    )

    joined = customer.select_columns(["c_custkey"]).join(
        counts,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t["n"], 0).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        vals, cnts = np.unique(n, return_counts=True)
        return pa.table(
            {
                "c_count": vals.astype(np.int64),
                "custdist": cnts.astype(np.int64),
            }
        )

    return (
        joined.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .map_batches(
            lambda t: pa.table(
                {
                    "c_count": t["c_count"].to_numpy().astype(np.int64),
                    "custdist": t["custdist"].to_numpy().astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
    )


def large_orders(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    qty_threshold: float = 250.0,
    k: int = 20,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q18-style large-volume orders: orders whose lineitems sum to
    more than ``qty_threshold`` units, with their customer, top-k by
    order totalprice.

    → (c_custkey, c_name, o_orderkey, o_totalprice, sum_qty: int64)
    ordered (totalprice desc as exact cents, orderkey asc).

    Plan: per-batch partial Σqty per orderkey (combiner prune — the
    GROUP BY ... HAVING runs as sum+filter, never shipping lineitem
    rows), filter to the rare over-threshold keys (output is tiny), then
    two inner joins against orders and customer and a bounded sort."""
    from ray.data.aggregate import Sum

    thr = float(qty_threshold)

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ok": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "q": np.rint(t["l_quantity"].to_numpy()).astype(np.int64),
            }
        )
        g = df.groupby("ok", sort=False).agg(q=("q", "sum")).reset_index()
        return pa.table(
            {
                "l_orderkey": g["ok"].to_numpy(np.int64),
                "q": g["q"].to_numpy(np.int64),
            }
        )

    def over_threshold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["sum_qty"], thr))

    big = (
        lineitem.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q", alias_name="sum_qty"))
        .map_batches(over_threshold, batch_format="pyarrow")
    )

    wo = big.join(
        orders.select_columns(["o_orderkey", "o_custkey", "o_totalprice"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    wc = wo.join(
        customer.select_columns(["c_custkey", "c_name"]),
        join_type="inner",
        num_partitions=max(2, num_partitions // 4),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["o_custkey"].to_numpy().astype(np.int64),
                "c_name": t["c_name"],
                "o_orderkey": t["l_orderkey"].to_numpy().astype(np.int64),
                "o_totalprice": t["o_totalprice"],
                "sum_qty": t["sum_qty"].to_numpy().astype(np.int64),
                "cents": cents,
            }
        )

    out = (
        wc.map_batches(finish, batch_format="pyarrow")
        .sort(["cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )
    return out.select_columns(
        ["c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"]
    )


# Q19-style OR-of-ANDs predicate: (brand, qty_lo, qty_hi, size_lo, size_hi)
_Q19_SPECS: tuple = (
    ("Brand#12", 1.0, 30.0, 1, 25),
    ("Brand#23", 5.0, 35.0, 1, 35),
    ("Brand#34", 10.0, 40.0, 1, 45),
)


def discounted_revenue(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    specs: tuple = _Q19_SPECS,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """TPC-H Q19-style discounted revenue under an OR-of-ANDs
    brand/quantity/size predicate — the compound-predicate showcase,
    evaluated fully vectorized (one boolean lane per disjunct, OR-folded)
    after the lineitem ⨝ part hash join.

    → one row (revenue, n_items: int64), revenue in exact 1e-4 units."""
    from ray.data.aggregate import Sum

    specs = tuple(specs)

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "q": t["l_quantity"],
                "u": cents * (100 - dcents),
            }
        )

    joined = lineitem.map_batches(li_prep, batch_format="pyarrow").join(
        part.select_columns(["p_partkey", "p_brand", "p_size"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = t["q"].to_numpy()
        keep = np.zeros(len(t), dtype=bool)
        for b, qlo, qhi, slo, shi in specs:
            keep |= (
                (brand == b)
                & (qty >= qlo)
                & (qty <= qhi)
                & (size >= slo)
                & (size <= shi)
            )
        u = int(t["u"].to_numpy()[keep].sum())
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "u": pa.array([u], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "n_items": t["n"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_Y1998_US = np.int64(int(pd.Timestamp("1998-01-01").value // 1000))


def local_supplier_revenue(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation_table: pa.Table,
    region_table: pa.Table,
    region: str = "ASIA",
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q5-style local-supplier revenue: Σ extprice·(1−disc) per
    customer nation within one region, counting only lineitems whose
    supplier sits in the SAME nation as the ordering customer.

    → (n_name, revenue, n_items: int64), revenue in exact 1e-4 units.

    Plan: the nation⨝region dictionary (≤25 rows by schema) resolves on
    the driver and rides along as a broadcast id→name map; customer and
    orders are filtered MAP-SIDE (region membership / date range) before
    the three genuinely big exchanges — orders⨝customer on custkey,
    lineitem⨝that on orderkey, and ⨝supplier on suppkey (supplier scales
    with SF, so it is hash-joined, never broadcast). The same-nation
    check is a vectorized mask after the last join, and only per-nation
    partial sums leave each block. Reference cost-shape analog: the
    multi-join aggregate jobs of the MR layer."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.blocks import materialize_clean

    rk = {
        int(k): v
        for k, v in zip(
            region_table["r_regionkey"].to_pylist(),
            region_table["r_name"].to_pylist(),
        )
    }
    nmap = {}  # nationkey -> n_name, region nations only
    for nk, nn, nr in zip(
        nation_table["n_nationkey"].to_pylist(),
        nation_table["n_name"].to_pylist(),
        nation_table["n_regionkey"].to_pylist(),
    ):
        if rk.get(int(nr)) == region:
            nmap[int(nk)] = nn
    nref = ray.put(nmap)
    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(date_hi_us if date_hi_us is not None else _Y1997_US)

    def cust_in_region(t: pa.Table) -> pa.Table:
        keep = np.isin(
            t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.fromiter(ray.get(nref).keys(), dtype=np.int64),
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"].filter(pa.array(keep)),
                "c_nationkey": t["c_nationkey"].filter(pa.array(keep)),
            }
        )

    def orders_in_range(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        m = pa.array((od >= lo) & (od < hi))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(m),
                "o_custkey": t["o_custkey"].filter(m),
            }
        )

    oc = (
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_in_range, batch_format="pyarrow")
        .join(
            materialize_clean(
                customer.select_columns(
                    ["c_custkey", "c_nationkey"]
                ).map_batches(cust_in_region, batch_format="pyarrow")
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .select_columns(["o_orderkey", "c_nationkey"])
    )

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "u": cents * (100 - dcents),
            }
        )

    lio = (
        lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .join(
            oc,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .join(
            supplier.select_columns(["s_suppkey", "s_nationkey"]),
            join_type="inner",
            num_partitions=max(2, num_partitions // 2),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = cn == sn
        df = pd.DataFrame({"nk": cn[same], "u": t["u"].to_numpy()[same]})
        g = (
            df.groupby("nk", sort=False)
            .agg(u=("u", "sum"), n=("u", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "nk": g["nk"].to_numpy(np.int64),
                "u": g["u"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    agg = (
        lio.map_batches(partial, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        return pa.table(
            {
                "n_name": pa.array(
                    [nm[int(k)] for k in t["nk"].to_pylist()], pa.string()
                ),
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "n_items": t["n"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def volume_shipping(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation_table: pa.Table,
    nation_a: str = "NATION_12",
    nation_b: str = "NATION_13",
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q7-style volume shipping: revenue shipped BETWEEN two nations
    (supplier in one, customer in the other), per (supp_nation,
    cust_nation, ship year).

    → (supp_nation, cust_nation, l_year: int64, revenue, n_items: int64).

    Plan: both dimension filters run map-side against the broadcast
    two-nation key set before any exchange, so the three hash joins only
    carry rows that can still qualify; the cross-nation predicate and the
    year extraction are vectorized after the last join and only
    ≤ 2·years partial rows leave each block."""
    from ray.data.aggregate import Sum

    sel = {}
    for nk, nn in zip(
        nation_table["n_nationkey"].to_pylist(),
        nation_table["n_name"].to_pylist(),
    ):
        if nn in (nation_a, nation_b):
            sel[int(nk)] = nn
    if len(sel) != 2:
        raise ValueError(f"nations {nation_a!r}/{nation_b!r} not found")
    nref = ray.put(sel)
    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(date_hi_us if date_hi_us is not None else _Y1998_US)

    def keep_nations(col: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            keys = np.fromiter(ray.get(nref).keys(), dtype=np.int64)
            v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = pa.array(np.isin(v, keys))
            return pa.table(
                {c: t[c].filter(m) for c in t.column_names}
            )

        return f

    from ..stages.blocks import materialize_clean

    # both dimension sides are nation-filtered (2/25 of rows survive), so
    # most map outputs are 0-row: scrub them — Ray's hash join crashes on a
    # partition fed only schema-less empties. Bounded data, metadata-only.
    cust = materialize_clean(
        customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
            keep_nations("c_nationkey", "c"), batch_format="pyarrow"
        )
    )
    supp = materialize_clean(
        supplier.select_columns(["s_suppkey", "s_nationkey"]).map_batches(
            keep_nations("s_nationkey", "s"), batch_format="pyarrow"
        )
    )

    oc = (
        orders.select_columns(["o_orderkey", "o_custkey"])
        .join(
            cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .select_columns(["o_orderkey", "c_nationkey"])
    )

    def li_prep(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        m = (ship >= lo) & (ship < hi)
        mm = pa.array(m)
        cents = np.rint(
            t["l_extendedprice"].filter(mm).to_numpy() * 100
        ).astype(np.int64)
        dcents = np.rint(t["l_discount"].filter(mm).to_numpy() * 100).astype(
            np.int64
        )
        yr = (
            t["l_shipdate"]
            .filter(mm)
            .cast(pa.timestamp("us"))
        )
        import pyarrow.compute as pc

        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].filter(mm),
                "l_suppkey": t["l_suppkey"].filter(mm),
                "l_year": pc.year(yr).cast(pa.int64()),
                "u": cents * (100 - dcents),
            }
        )

    lio = (
        lineitem.select_columns(
            [
                "l_orderkey",
                "l_suppkey",
                "l_shipdate",
                "l_extendedprice",
                "l_discount",
            ]
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .join(
            oc,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .join(
            supp,
            join_type="inner",
            num_partitions=max(2, num_partitions // 2),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cross = cn != sn  # both already ∈ {a, b}
        df = pd.DataFrame(
            {
                "sn": sn[cross],
                "cn": cn[cross],
                "yr": t["l_year"].to_numpy()[cross],
                "u": t["u"].to_numpy()[cross],
            }
        )
        g = (
            df.groupby(["sn", "cn", "yr"], sort=False)
            .agg(u=("u", "sum"), n=("u", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nm[int(k)] for k in g["sn"]], pa.string()
                ),
                "cust_nation": pa.array(
                    [nm[int(k)] for k in g["cn"]], pa.string()
                ),
                "l_year": g["yr"].to_numpy(np.int64),
                "u": g["u"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    agg = (
        lio.map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "supp_nation": t["supp_nation"],
                "cust_nation": t["cust_nation"],
                "l_year": t["l_year"].to_numpy().astype(np.int64),
                "revenue": t["u"].to_numpy().astype(np.float64) / 10000.0,
                "n_items": t["n"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def top_supplier(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """TPC-H Q15-style top supplier: the supplier(s) whose discounted
    revenue over a ship-date quarter equals the global maximum.

    → (s_suppkey, s_name, total_revenue), suppkey-ascending.

    Plan: per-batch partial Σ per suppkey (combiner — lineitem rows never
    shuffle), one suppliers-bounded groupby, a constant-key max fold over
    THAT table (two tiny rows per block), then a map-side filter against
    the broadcast max and one suppliers-bounded join for the name. The
    revenue view is computed once and reused for both the max and the
    filter (Q15's CREATE VIEW analog)."""
    from ray.data.aggregate import Max, Sum

    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(
        date_hi_us
        if date_hi_us is not None
        else np.int64(int(pd.Timestamp("1996-04-01").value // 1000))
    )

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        m = (ship >= lo) & (ship < hi)
        cents = np.rint(t["l_extendedprice"].to_numpy()[m] * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy()[m] * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False)[m].astype(
                    np.int64
                ),
                "u": cents * (100 - dcents),
            }
        )
        g = df.groupby("sk", sort=False).agg(u=("u", "sum")).reset_index()
        return pa.table(
            {
                "l_suppkey": g["sk"].to_numpy(np.int64),
                "u": g["u"].to_numpy(np.int64),
            }
        )

    from ..stages.blocks import materialize_clean

    rev = materialize_clean(  # suppliers-bounded; reused for max AND filter
        lineitem.select_columns(
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("u", alias_name="u"))
    )
    mx = rev.max("u")
    mref = ray.put(int(mx))

    def is_top(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["u"], ray.get(mref)))

    # scrub 0-row map outputs: Ray's hash join crashes on a partition fed
    # only schema-less empties (tiny top set, metadata-only cost)
    top = materialize_clean(rev.map_batches(is_top, batch_format="pyarrow"))
    out = top.join(
        supplier.select_columns(["s_suppkey", "s_name"]),
        join_type="inner",
        num_partitions=2,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t["l_suppkey"].to_numpy().astype(np.int64),
                "s_name": t["s_name"],
                "total_revenue": t["u"].to_numpy().astype(np.float64)
                / 10000.0,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("s_suppkey")


def small_quantity_revenue(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    brand: str = "Brand#13",
    ratio_num: int = 1,
    ratio_den: int = 5,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """TPC-H Q17-style small-quantity-order revenue: lineitems of one
    brand whose quantity is below ``ratio_num/ratio_den`` of that part's
    average quantity; reports Σ extendedprice / 7 (the "yearly loss if
    small orders stopped" figure).

    → one row (avg_yearly, n_items: int64), 1e-6-exact (cents / 7 rounded
    to 6 decimals, mirrored by the oracle).

    Plan: part keys filter map-side to the brand; ONE distributed join
    ships only that brand's lineitems; the correlated sub-aggregate is a
    per-part (Σqty, count) combine over the SAME materialized join output
    — reused, not recomputed — then re-joined part-bounded and compared
    with the exact integer cross-multiplication qc·den·cnt < num·Σqc
    (never a float average)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    keys = part.map_batches(
        lambda t: pa.table(
            {"p_partkey": t["p_partkey"].filter(pc.equal(t["p_brand"], brand))}
        ),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qc": np.rint(t["l_quantity"].to_numpy() * 100).astype(
                    np.int64
                ),
                "cents": np.rint(
                    t["l_extendedprice"].to_numpy() * 100
                ).astype(np.int64),
            }
        )

    lip = (
        lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"]
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .join(
            keys,
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )
        .materialize()  # brand-bounded; feeds BOTH the avg pass and the filter
    )

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "qc": t["qc"].to_numpy(),
            }
        )
        g = (
            df.groupby("pk", sort=False)
            .agg(sq=("qc", "sum"), cnt=("qc", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "pk": g["pk"].to_numpy(np.int64),
                "sq": g["sq"].to_numpy(np.int64),
                "cnt": g["cnt"].to_numpy(np.int64),
            }
        )

    avg = (
        lip.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("sq", alias_name="sq"), Sum("cnt", alias_name="cnt"))
    )

    wavg = lip.join(
        avg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("pk",),
    )
    num, den = np.int64(ratio_num), np.int64(ratio_den)

    def keep_small(t: pa.Table) -> pa.Table:
        qc = t["qc"].to_numpy()
        small = qc * den * t["cnt"].to_numpy() < num * t["sq"].to_numpy()
        u = int(t["cents"].to_numpy()[small].sum())
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "u": pa.array([u], pa.int64()),
                "n": pa.array([int(small.sum())], pa.int64()),
            }
        )

    agg = (
        wavg.map_batches(keep_small, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("u", alias_name="u"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        from ..functions.fasthash import round_like_sql

        u = t["u"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "avg_yearly": round_like_sql(u / 100.0 / 7.0, 6),
                "n_items": t["n"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def supplier_part_counts(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    exclude_brand: str = "Brand#1",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q16-style supplier counts per part group: how many DISTINCT
    suppliers ship each (brand, type, size) combination, excluding one
    brand and restricted to a size list (lineitem is the part↔supplier
    bridge — this schema carries no partsupp table).

    → (p_brand, p_type, p_size: int64, supplier_cnt: int64).

    Plan: per-batch (partkey, suppkey) dedup (combiner) → one pair-distinct
    groupby; join the surviving pairs against the map-side-filtered part
    slice; second dedup at (brand, type, size, suppkey) via groupby; close
    with a per-batch count partial + 3-key sum. Every exchange carries
    distinct keys, never lineitem rows; COUNT(DISTINCT) never funnels to
    one task."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    szs = np.asarray(sizes, dtype=np.int64)
    sref = ray.put(szs)

    def pair_dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "l_partkey": df["pk"].to_numpy(np.int64),
                "l_suppkey": df["sk"].to_numpy(np.int64),
            }
        )

    pairs = (
        lineitem.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(pair_dedup, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .count()
        .drop_columns(["count()"])
    )

    def part_slice(t: pa.Table) -> pa.Table:
        sz = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pa.array(
            np.isin(sz, ray.get(sref))
            & (t["p_brand"].to_numpy(zero_copy_only=False) != exclude_brand)
        )
        return pa.table(
            {
                "p_partkey": t["p_partkey"].filter(keep),
                "p_brand": t["p_brand"].filter(keep),
                "p_type": t["p_type"].filter(keep),
                "p_size": t["p_size"].filter(keep),
            }
        )

    joined = pairs.join(
        part.select_columns(
            ["p_partkey", "p_brand", "p_type", "p_size"]
        ).map_batches(part_slice, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    distinct = (
        joined.groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
        .count()
        .drop_columns(["count()"])
    )

    def cnt_partial(t: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "p_brand": t["p_brand"].to_pylist(),
                    "p_type": t["p_type"].to_pylist(),
                    "p_size": t["p_size"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        distinct.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("c", alias_name="supplier_cnt"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": t["p_size"].to_numpy().astype(np.int64),
                "supplier_cnt": t["supplier_cnt"].to_numpy().astype(np.int64),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sales_opportunity(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    since_us: int | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q22-style global sales opportunity: customers with an
    account balance above the average POSITIVE balance and no order since
    ``since_us`` (Q22's 7-year dormancy window), rolled up per market
    segment (this schema carries no phone column, so the segment plays
    Q22's country-code role).

    → (c_mktsegment, n_custs: int64, total_acctbal).

    Plan: the average is a constant-key (Σcents, count) fold (two ints per
    block); the above-average test is the exact integer cross-multiply
    cents·cnt > Σcents (never a float average); the NOT EXISTS is the
    distributed anti join of ``inactive_customers`` — date filter +
    per-batch custkey dedup, distinct-close, LEFT OUTER + null filter.
    Nothing is ever broadcast but two scalars."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    since = np.int64(
        since_us
        if since_us is not None
        else int(pd.Timestamp("1999-01-01").value // 1000)
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    stats = (
        customer.select_columns(["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .take_all()
    )
    sum_c = int(stats[0]["s"]) if stats else 0
    cnt = int(stats[0]["n"]) if stats else 0
    if cnt == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_custs": pa.array([], pa.int64()),
                    "total_acctbal": pa.array([], pa.float64()),
                }
            )
        )

    def recent_keys(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        return pa.table(
            {"o_custkey": pc.unique(t["o_custkey"].filter(pa.array(od >= since)))}
        )

    okeys = (
        orders.select_columns(["o_custkey", "o_orderdate"])
        .map_batches(recent_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "has_order": pa.array(
                        np.ones(len(t), dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def rich(t: pa.Table) -> pa.Table:
        cents = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        keep = pa.array(cents * cnt > sum_c)
        return pa.table(
            {
                "c_custkey": t["c_custkey"].filter(keep),
                "c_mktsegment": t["c_mktsegment"].filter(keep),
                "cents": pa.array(cents[keep.to_numpy(zero_copy_only=False)]),
            }
        )

    joined = (
        customer.select_columns(["c_custkey", "c_mktsegment", "c_acctbal"])
        .map_batches(rich, batch_format="pyarrow")
        .join(
            okeys,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )
    )

    def seg_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["has_order"]))
        df = (
            pd.DataFrame(
                {
                    "seg": t["c_mktsegment"].to_pylist(),
                    "cents": t["cents"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("seg", sort=False)
            .agg(cents=("cents", "sum"), n=("cents", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "c_mktsegment": pa.array(df["seg"], pa.string()),
                "cents": df["cents"].to_numpy(np.int64),
                "n": df["n"].to_numpy(np.int64),
            }
        )

    agg = (
        joined.map_batches(seg_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_custs": t["n"].to_numpy().astype(np.int64),
                "total_acctbal": t["cents"].to_numpy().astype(np.float64)
                / 100.0,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def market_share(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    part: ray.data.Dataset,
    nation_table: pa.Table,
    region_table: pa.Table,
    nation: str = "NATION_2",
    region: str = "ASIA",
    p_type: str = "ECONOMY",
    date_lo_us: int | None = None,
    date_hi_us: int | None = None,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q8-style national market share: within one region's customer
    orders of one part type, the per-year fraction of discounted revenue
    supplied by ``nation``.

    → (o_year, nation_revenue, total_revenue, mkt_share), revenues in
    exact 1e-4 units / 10000, share = one double division of the two
    exact int folds.

    Plan — the deepest join chain in the suite (4 distributed hash
    joins), every input scrubbed MAP-SIDE first so the exchanges carry
    survivors only:

      part    --p_type filter-->  (p_partkey)                 ⨝ lineitem
      orders  --date window  -->  (o_orderkey, year)
      customer--region filter-->  (c_custkey)  [25-row broadcast dict]
      oc   = orders ⨝ customer        on custkey
      lp   = lineitem(prep u) ⨝ part  on partkey
      lpo  = lp ⨝ oc                  on orderkey
      full = lpo ⨝ supplier           on suppkey   (data-proportional)
      per-(year) partial (nation units, total units) → 2-row groupby.

    The supplier side is never broadcast (it scales with SF); only the
    ≤25-row nation/region dictionary rides along by value. Reference
    cost-shape analog: the MR layer's chained equijoin aggregate jobs."""
    from ray.data.aggregate import Sum

    from ..stages.blocks import materialize_clean

    rk = {
        int(k): v
        for k, v in zip(
            region_table["r_regionkey"].to_pylist(),
            region_table["r_name"].to_pylist(),
        )
    }
    region_nks = []
    target_nk = -1
    for nk, nn, nr in zip(
        nation_table["n_nationkey"].to_pylist(),
        nation_table["n_name"].to_pylist(),
        nation_table["n_regionkey"].to_pylist(),
    ):
        if rk.get(int(nr)) == region:
            region_nks.append(int(nk))
        if nn == nation:
            target_nk = int(nk)
    region_nks_arr = np.asarray(sorted(region_nks), dtype=np.int64)
    lo = np.int64(date_lo_us if date_lo_us is not None else _Y1996_US)
    hi = np.int64(date_hi_us if date_hi_us is not None else _Y1998_US)

    def cust_in_region(t: pa.Table) -> pa.Table:
        keep = np.isin(
            t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            region_nks_arr,
        )
        return pa.table({"c_custkey": t["c_custkey"].filter(pa.array(keep))})

    def orders_in_range(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        m = pa.array((od >= lo) & (od < hi))
        kept = t.filter(m)
        # calendar year from the µs timestamp, vectorized (both sides use
        # the proleptic-Gregorian calendar)
        yr = pd.to_datetime(kept["o_orderdate"].to_pandas()).dt.year.to_numpy()
        return pa.table(
            {
                "o_orderkey": kept["o_orderkey"],
                "o_custkey": kept["o_custkey"],
                "o_year": yr.astype(np.int64),
            }
        )

    oc = (
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_in_range, batch_format="pyarrow")
        .join(
            materialize_clean(
                customer.select_columns(
                    ["c_custkey", "c_nationkey"]
                ).map_batches(cust_in_region, batch_format="pyarrow")
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .select_columns(["o_orderkey", "o_year"])
    )

    def part_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(t["p_type"], p_type)
        return pa.table({"p_partkey": t["p_partkey"].filter(m)})

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "u": cents * (100 - dcents),
            }
        )

    lp = (
        lineitem.select_columns(
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
            ]
        )
        .map_batches(li_prep, batch_format="pyarrow")
        .join(
            materialize_clean(
                part.select_columns(["p_partkey", "p_type"]).map_batches(
                    part_filter, batch_format="pyarrow"
                )
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )
        .select_columns(["l_orderkey", "l_suppkey", "u"])
    )

    full = lp.join(
        oc,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).join(
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        yr = t["o_year"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t["u"].to_numpy()
        # pandas int64 groupby keeps the fold exact (bincount weights
        # would round through float64)
        g = (
            pd.DataFrame(
                {"yr": yr, "nu": np.where(sn == target_nk, u, 0), "tu": u}
            )
            .groupby("yr", sort=False)
            .agg(nu=("nu", "sum"), tu=("tu", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "o_year": g["yr"].to_numpy(np.int64),
                "nu": g["nu"].to_numpy(np.int64),
                "tu": g["tu"].to_numpy(np.int64),
            }
        )

    agg = (
        full.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nu", alias_name="nu"), Sum("tu", alias_name="tu"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nu = t["nu"].to_numpy().astype(np.float64)
        tu = t["tu"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "o_year": t["o_year"].cast(pa.int64()),
                "nation_revenue": nu / 10000.0,
                "total_revenue": tu / 10000.0,
                "mkt_share": nu / tu,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def min_cost_supplier(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    part: ray.data.Dataset,
    nation_table: pa.Table,
    p_type: str = "ECONOMY",
    max_size: int = 15,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q2-style best-supplier-per-part: for every part of one type
    under a size cap, the supplier with the HIGHEST account balance among
    the suppliers that actually ship it (ties broken by lowest suppkey).

    → (p_partkey, p_brand, p_type, s_name, s_acctbal, n_name).

    The supply relation (partsupp analog) is derived from lineitem as the
    distinct (l_partkey, l_suppkey) pairs — per-batch dedup (combiner
    prune) then one groupby close, so the exchange carries distinct pairs
    per block, never lineitem rows. The correlated argmax is a single
    int64 combined key ``cents·2^24 − suppkey`` (monotone in acctbal,
    anti-monotone in suppkey; valid while suppkey < 2^24 — documented
    bound, suppkeys are dense from 0) folded max per part in two levels,
    then an equality join back to the candidate rows recovers the winning
    supplier's payload exactly. No side is broadcast except the ≤25-row
    nation dictionary. Reference cost-shape analog: the MR layer's
    correlated-min equijoin jobs (jobgen/JobGen.java group-join chains)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    from ..stages.blocks import materialize_clean

    nmap = {
        int(k): v
        for k, v in zip(
            nation_table["n_nationkey"].to_pylist(),
            nation_table["n_name"].to_pylist(),
        )
    }
    nref = ray.put(nmap)

    def pair_dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "l_suppkey": t["l_suppkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    supply = (
        lineitem.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(pair_dedup, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .count()
        .select_columns(["l_partkey", "l_suppkey"])
    )

    def supp_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["s_acctbal"].to_numpy() * 100).astype(np.int64)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": sk,
                "s_name": t["s_name"],
                "s_acctbal": t["s_acctbal"],
                "s_nationkey": t["s_nationkey"],
                "ck": cents * np.int64(1 << 24) - sk,
            }
        )

    cand = supply.join(
        supplier.select_columns(
            ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
        ).map_batches(supp_prep, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def best_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_partkey": t["l_partkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "ck": t["ck"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("l_partkey", sort=False)["ck"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    best = (
        cand.select_columns(["l_partkey", "ck"])
        .map_batches(best_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Max("ck", alias_name="best_ck"))
    )

    winners = cand.join(
        materialize_clean(best),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("l_partkey",),
    ).filter(expr="ck == best_ck")

    def part_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t["p_type"], p_type),
            pc.less_equal(t["p_size"], max_size),
        )
        kept = t.filter(m)
        return pa.table(
            {
                "p_partkey": kept["p_partkey"],
                "p_brand": kept["p_brand"],
                "p_type": kept["p_type"],
            }
        )

    full = winners.join(
        materialize_clean(
            part.select_columns(
                ["p_partkey", "p_brand", "p_type", "p_size"]
            ).map_batches(part_filter, batch_format="pyarrow")
        ),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = np.array([nm.get(int(k), "") for k in nk], dtype=object)
        return pa.table(
            {
                "p_partkey": t["l_partkey"].cast(pa.int64()),
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "s_name": t["s_name"],
                "s_acctbal": t["s_acctbal"],
                "n_name": pa.array(names.tolist(), pa.string()),
            }
        )

    return full.map_batches(finish, batch_format="pyarrow")


def product_type_profit(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    supplier: ray.data.Dataset,
    part: ray.data.Dataset,
    nation_table: pa.Table,
    name_substr: str = "widget",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q9-style product-type profit: discounted revenue per
    (supplier nation, order year) over lineitems whose part NAME contains
    ``name_substr`` (the generator has no partsupp/supplycost, so profit
    is the revenue term of Q9's expression — the join/rollup shape is
    Q9's: part name filter ⨝ lineitem ⨝ orders ⨝ supplier + broadcast
    nation, grouped by nation × year).

    → (n_name, o_year, sum_profit) with the fold in exact 1e-4 units."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.blocks import materialize_clean

    nmap = {
        int(k): v
        for k, v in zip(
            nation_table["n_nationkey"].to_pylist(),
            nation_table["n_name"].to_pylist(),
        )
    }
    nref = ray.put(nmap)

    def part_filter(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], name_substr)
        return pa.table({"p_partkey": t["p_partkey"].filter(m)})

    def li_prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "u": cents * (100 - dcents),
            }
        )

    def orders_prep(t: pa.Table) -> pa.Table:
        yr = pd.to_datetime(t["o_orderdate"].to_pandas()).dt.year.to_numpy()
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": yr.astype(np.int64),
            }
        )

    lp = lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow").join(
        materialize_clean(
            part.select_columns(["p_partkey", "p_name"]).map_batches(
                part_filter, batch_format="pyarrow"
            )
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_partkey",),
        right_on=("p_partkey",),
    ).select_columns(["l_orderkey", "l_suppkey", "u"])

    full = lp.join(
        orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
            orders_prep, batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).join(
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = t["o_year"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = np.array([nm.get(int(k), "") for k in nk], dtype=object)
        g = (
            pd.DataFrame(
                {"n_name": names, "o_year": yr, "u": t["u"].to_numpy()}
            )
            .groupby(["n_name", "o_year"], sort=False)["u"]
            .sum()
            .reset_index()
        )
        g["u"] = g["u"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        full.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("u", alias_name="u"))
    )

    return agg.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "o_year": t["o_year"].cast(pa.int64()),
                "sum_profit": t["u"].to_numpy().astype(np.float64) / 10000.0,
            }
        ),
        batch_format="pyarrow",
    )


def important_parts(
    lineitem: ray.data.Dataset,
    num: int = 5,
    den: int = 4,
) -> ray.data.Dataset:
    """TPC-H Q11-style important stock: parts whose total discounted
    lineitem value exceeds ``num/den`` of the MEAN per-part value (the
    generator has no partsupp, so part value is the revenue folded over
    lineitem; Q11's literal FRACTION·total threshold is 0.0001/SF —
    scale-dependent by spec — so the scale-free mean-relative form keeps
    the same per-key-sums / global-scalar / HAVING shape without the
    selectivity collapsing to 0 or 100% as SF moves).

    → (l_partkey, value) for qualifying parts, value in dollars.

    Plan: per-batch partial (partkey, units) sums → one parts-bounded
    groupby → the per-part table is materialized ONCE and reused for both
    the global scalars (total + part count, constant-key folds over the
    already-tiny per-part aggregate, never a second pass over lineitem)
    and the threshold filter. Exactness: the HAVING test multiplies
    through by the exact integer total (u·nparts·den > num·total) — no
    float threshold."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(
            np.int64
        )
        dcents = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "l_partkey": t["l_partkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "u": cents * (100 - dcents),
                }
            )
            .groupby("l_partkey", sort=False)["u"]
            .sum()
            .reset_index()
        )
        g["u"] = g["u"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = (
        lineitem.select_columns(
            ["l_partkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("u", alias_name="u"))
        .materialize()
    )

    total = int(per_part.sum("u"))
    nparts = int(per_part.count())
    # exact integer HAVING: u·den·nparts > num·total  ⇔  u > ⌊num·total /
    # (den·nparts)⌋ (true for both the divisible and indivisible case), so
    # the test is ONE exact Python-int division on the driver and a
    # vectorized int64 compare per batch — no overflow at any scale
    thr = (num * total) // (den * nparts) if nparts else 0

    def close(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy().astype(np.int64)
        keep = u > thr
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_partkey": kept["l_partkey"].cast(pa.int64()),
                "value": kept["u"].to_numpy().astype(np.float64) / 10000.0,
            }
        )

    return per_part.map_batches(close, batch_format="pyarrow")


def late_shipment_counts(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    late_days: int = 90,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q12-style two-bucket late-shipment counts: among lineitems
    shipped more than ``late_days`` after their order date (the generator
    has no shipmode/commit/receipt dates, so "late" is shipdate −
    orderdate and the mode column is l_returnflag), count critical
    (1-URGENT / 2-HIGH) vs non-critical order priorities per flag.

    → (l_returnflag, high_line_count, low_line_count).

    One distributed hash join (lineitem ⨝ orders on orderkey), then a
    map-side dual conditional count partial → 3-group shuffle — Q12's
    exact CASE-WHEN rollup shape."""
    from ray.data.aggregate import Sum

    lateness_us = np.int64(late_days) * np.int64(86_400_000_000)

    joined = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_shipdate"]
    ).join(
        orders.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        od = t["o_orderdate"].cast(pa.int64()).to_numpy()
        late = ship > od + lateness_us
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        crit = (pr == "1-URGENT") | (pr == "2-HIGH")
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_numpy(
                        zero_copy_only=False
                    )[late],
                    "hi": crit[late].astype(np.int64),
                }
            )
            .groupby("l_returnflag", sort=False)
            .agg(hi=("hi", "sum"), n=("hi", "size"))
            .reset_index()
        )
        g["hi"] = g["hi"].astype(np.int64)
        g["lo"] = (g["n"] - g["hi"]).astype(np.int64)
        return pa.Table.from_pandas(
            g[["l_returnflag", "hi", "lo"]], preserve_index=False
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("hi", alias_name="high_line_count"),
            Sum("lo", alias_name="low_line_count"),
        )
    )

    return agg.map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "high_line_count": t["high_line_count"]
                .to_numpy()
                .astype(np.int64),
                "low_line_count": t["low_line_count"]
                .to_numpy()
                .astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )


def part_promotion_suppliers(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    part: ray.data.Dataset,
    name_substr: str = "bolt",
    num: int = 1,
    den: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q20-style promotion candidates: suppliers that DOMINATE the
    supply of some name-filtered part — their shipped quantity of the part
    exceeds ``num/den`` of its total shipped quantity (the partsupp
    availqty test re-expressed over the lineitem-derived supply relation;
    the nested-semi-join shape is Q20's).

    → (s_suppkey, s_name), distinct.

    Plan: per-batch partial (partkey, suppkey, qty) sums ⨝ name-filtered
    part keys → pair totals (one groupby) → per-part totals (second,
    parts-bounded groupby) → equijoin pairs⨝totals with the exact integer
    threshold ``qty·den > num·total`` → distinct suppkeys (combiner-pruned)
    ⨝ supplier. No broadcast of any scaling side."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..stages.blocks import materialize_clean

    def part_filter(t: pa.Table) -> pa.Table:
        m = pc.match_substring(t["p_name"], name_substr)
        return pa.table({"p_partkey": t["p_partkey"].filter(m)})

    def qty_partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "l_partkey": t["l_partkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "l_suppkey": t["l_suppkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "qc": np.rint(t["l_quantity"].to_numpy() * 100).astype(
                        np.int64
                    ),
                }
            )
            .groupby(["l_partkey", "l_suppkey"], sort=False)["qc"]
            .sum()
            .reset_index()
        )
        g["qc"] = g["qc"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (
        lineitem.select_columns(["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .join(
            materialize_clean(
                part.select_columns(["p_partkey", "p_name"]).map_batches(
                    part_filter, batch_format="pyarrow"
                )
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_partkey",),
            right_on=("p_partkey",),
        )
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum("qc", alias_name="qc"))
        .materialize()
    )

    def tot_partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "l_partkey": t["l_partkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "tq": t["qc"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    ),
                }
            )
            .groupby("l_partkey", sort=False)["tq"]
            .sum()
            .reset_index()
        )
        g["tq"] = g["tq"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = (
        pairs.select_columns(["l_partkey", "qc"])
        .map_batches(tot_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("tq", alias_name="tq"))
    )

    dominant = pairs.join(
        materialize_clean(totals),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_partkey",),
        right_on=("l_partkey",),
    )

    def supp_keys(t: pa.Table) -> pa.Table:
        qc = t["qc"].to_numpy(zero_copy_only=False).astype(np.int64)
        tq = t["tq"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = qc * den > num * tq
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[
            keep
        ]
        return pa.table({"l_suppkey": np.unique(sk)})

    sks = materialize_clean(
        dominant.map_batches(supp_keys, batch_format="pyarrow")
        .groupby("l_suppkey")
        .count()
        .select_columns(["l_suppkey"])
    )
    # degenerate threshold → zero candidates: short-circuit with a typed
    # empty table (an all-empty join side would reach Acero schema-less)
    if sks.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                }
            )
        )

    out = sks.join(
        supplier.select_columns(["s_suppkey", "s_name"]),
        join_type="inner",
        num_partitions=2,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    return out.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["l_suppkey"].cast(pa.int64()),
                "s_name": t["s_name"],
            }
        ),
        batch_format="pyarrow",
    )


def waiting_suppliers(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    supplier: ray.data.Dataset,
    late_days: int = 60,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """TPC-H Q21-style waiting-supplier counts: per supplier, the number
    of finalized ('F') multi-supplier orders where THAT supplier shipped
    late and NO other supplier did (the generator has no commit/receipt
    dates, so late = shipdate > orderdate + ``late_days``; the
    EXISTS other-supplier / NOT-EXISTS other-late-supplier pair is Q21's).

    → (s_name, numwait), suppliers with ≥1 qualifying order.

    Plan: orders filtered map-side to status F ⨝ lineitem (one hash
    join) → per-batch distinct (orderkey, suppkey, late) partials →
    groupby (orderkey, suppkey) Max(late) closes the per-pair late flag →
    per-order counts (n_supp, n_late) via a second, orders-bounded
    groupby → equijoin back to the pairs picks the qualifying
    (late ∧ n_supp>1 ∧ n_late==1) rows exactly → per-supplier counts ⨝
    supplier names. Both exists-tests become bounded groupbys; nothing is
    broadcast."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Sum

    from ..stages.blocks import materialize_clean

    lateness_us = np.int64(late_days) * np.int64(86_400_000_000)

    def orders_f(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table(
            {
                "o_orderkey": kept["o_orderkey"],
                "o_orderdate": kept["o_orderdate"].cast(pa.int64()),
            }
        )

    joined = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_shipdate"]
    ).join(
        materialize_clean(
            orders.select_columns(
                ["o_orderkey", "o_orderdate", "o_orderstatus"]
            ).map_batches(orders_f, batch_format="pyarrow")
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "l_orderkey": t["l_orderkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "l_suppkey": t["l_suppkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "late": (ship > od + lateness_us).astype(np.int64),
                }
            )
            .groupby(["l_orderkey", "l_suppkey"], sort=False)["late"]
            .max()
            .reset_index()
        )
        g["late"] = g["late"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("late", alias_name="late"))
        .materialize()
    )

    def order_partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "l_orderkey": t["l_orderkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "late": t["late"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("l_orderkey", sort=False)
            .agg(n_supp=("late", "size"), n_late=("late", "sum"))
            .reset_index()
        )
        for c in ("n_supp", "n_late"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = (
        pairs.map_batches(order_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Sum("n_supp", alias_name="n_supp"),
            Sum("n_late", alias_name="n_late"),
        )
    )

    qual = pairs.join(
        materialize_clean(per_order),
        join_type="inner",
        num_partitions=max(2, num_partitions // 2),
        on=("l_orderkey",),
        right_on=("l_orderkey",),
    )

    def wait_partial(t: pa.Table) -> pa.Table:
        late = t["late"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = t["n_supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = t["n_late"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (late == 1) & (ns > 1) & (nl == 1)
        g = (
            pd.DataFrame(
                {
                    "l_suppkey": t["l_suppkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]
                }
            )
            .groupby("l_suppkey", sort=False)
            .size()
            .reset_index(name="numwait")
        )
        g["numwait"] = g["numwait"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    waits = (
        qual.map_batches(wait_partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
    )

    out = waits.join(
        supplier.select_columns(["s_suppkey", "s_name"]),
        join_type="inner",
        num_partitions=2,
        on=("l_suppkey",),
        right_on=("s_suppkey",),
    )

    return out.map_batches(
        lambda t: pa.table(
            {
                "s_name": t["s_name"],
                "numwait": t["numwait"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )


def maintained_pricing_summary(
    lineitem: ray.data.Dataset,
    inserts: ray.data.Dataset,
    delete_mod: int = 10,
    delete_rem: int = 3,
    cutoff_us: int | None = None,
    num_partitions: int = 4,
) -> ray.data.Dataset:
    """TPC-H refresh-stream (RF1/RF2) analog: maintain the Q1 pricing
    summary INCREMENTALLY under a delete predicate (``l_orderkey %
    delete_mod == delete_rem`` — RF2's delete-by-orderkey shape) and an
    insert batch, WITHOUT rescanning+regrouping the combined table: all
    three streams fold through the SAME per-batch partial as
    ``pricing_summary``, with deletes contributing NEGATIVE partials, and
    one groups-bounded groupby merges them (classic incremental view
    maintenance — sums/counts are self-maintainable because the fold is
    exact integers; floats would drift under +/−).

    → same schema as ``pricing_summary``; rows whose maintained count
    reaches 0 drop out (their group no longer exists)."""
    from ray.data.aggregate import Sum

    cut = np.int64(cutoff_us if cutoff_us is not None else _CUTOFF_US)
    mod = np.int64(delete_mod)
    rem = np.int64(delete_rem)

    def signed_partial(sign: int, deletes_only: bool):
        sgn = np.int64(sign)

        def partial(t: pa.Table) -> pa.Table:
            ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
            keep = ship <= cut
            if deletes_only:
                ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                keep = keep & (ok % mod == rem)
            qty = np.rint(t["l_quantity"].to_numpy()[keep]).astype(np.int64)
            cents = np.rint(
                t["l_extendedprice"].to_numpy()[keep] * 100
            ).astype(np.int64)
            dcents = np.rint(t["l_discount"].to_numpy()[keep] * 100).astype(
                np.int64
            )
            df = pd.DataFrame(
                {
                    "l_returnflag": t["l_returnflag"].to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "l_linestatus": t["l_linestatus"].to_numpy(
                        zero_copy_only=False
                    )[keep],
                    "q": sgn * qty,
                    "c": sgn * cents,
                    "u": sgn * cents * (100 - dcents),
                    "one": np.full(int(keep.sum()), sgn, dtype=np.int64),
                }
            )
            g = (
                df.groupby(["l_returnflag", "l_linestatus"], sort=False)
                .agg(
                    sum_q=("q", "sum"),
                    sum_c=("c", "sum"),
                    sum_u=("u", "sum"),
                    n=("one", "sum"),
                )
                .reset_index()
            )
            for col in ["sum_q", "sum_c", "sum_u", "n"]:
                g[col] = g[col].astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        return partial

    cols = [
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate",
    ]
    base = lineitem.select_columns(cols).map_batches(
        signed_partial(+1, deletes_only=False), batch_format="pyarrow"
    )
    dels = lineitem.select_columns(cols).map_batches(
        signed_partial(-1, deletes_only=True), batch_format="pyarrow"
    )
    ins = inserts.select_columns(cols).map_batches(
        signed_partial(+1, deletes_only=False), batch_format="pyarrow"
    )

    agg = (
        base.union(dels)
        .union(ins)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_q", alias_name="sum_q"),
            Sum("sum_c", alias_name="sum_c"),
            Sum("sum_u", alias_name="sum_u"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy().astype(np.int64)
        live = pa.array(n > 0)
        t = t.filter(live)
        q = t["sum_q"].to_numpy().astype(np.int64)
        c = t["sum_c"].to_numpy().astype(np.float64)
        u = t["sum_u"].to_numpy().astype(np.float64)
        n = t["n"].to_numpy().astype(np.int64)
        nd = n.astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": q,
                "sum_base_price": c / 100.0,
                "sum_disc_price": u / 10000.0,
                "n": n,
                "avg_qty": q.astype(np.float64) / nd,
                "avg_price": c / 100.0 / nd,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
