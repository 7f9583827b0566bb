"""The bench.py 10x generator is gate infrastructure: replicas must
keep keys unique, FKs joinable, and lineitem key-aligned row groups."""

from __future__ import annotations

import duckdb

import bench
from clickhouse_only_importer_prototype_spark import stats


def test_gen_10x_replicas_unique_joinable_aligned(tmp_path):
    out = str(tmp_path / "x2")
    bench.gen_10x("/root/testdata/sf0.001", out, copies=2)
    con = duckdb.connect()
    n_orders, n_orders_distinct = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT o_orderkey) "
        f"FROM read_parquet('{out}/orders.parquet')"
    ).fetchone()
    assert n_orders == n_orders_distinct  # key shift keeps uniqueness
    # FK joins survive inside every replica: all orders keep a customer
    dangling = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/orders.parquet') o "
        f"LEFT JOIN read_parquet('{out}/customer.parquet') c "
        f"ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"
    ).fetchone()[0]
    assert dangling == 0
    base = con.execute(
        "SELECT COUNT(*) FROM read_parquet("
        "'/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchone()[0]
    n_line = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out}/lineitem.parquet')"
    ).fetchone()[0]
    assert n_line == 2 * base
    # lineitem is key-sorted; row groups never straddle an orderkey
    segs = stats.parquet_rowgroup_stats(f"{out}/lineitem.parquet", "l_orderkey")
    s = sorted(segs)
    assert all(b[0] > a[1] for a, b in zip(s, s[1:])) or len(s) == 1
    # dims are copied, not replicated
    assert (
        con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/nation.parquet')"
        ).fetchone()[0]
        == 25
    )
    # full gen: manifest records every fact table as replicated
    import json

    with open(f"{out}/_gen_manifest.json") as fh:
        m = json.load(fh)
    assert m["verbatim_1x"] == [] and m["copies"] == 2
    assert "lineitem" in m["replicated"] and "nation" not in m["replicated"]


def test_gen_10x_targeted_writes_manifest_and_sized_groups(tmp_path):
    """--tables gens must (a) record the non-joinable verbatim tables
    in the manifest so the bench runner can refuse cross-family runs,
    and (b) write the verbatim copies with the same 16 MB row-group
    sizing as replicated tables (a default-sized copy of a large table
    lands as a handful of oversized groups — the scan-split straggler
    the sizing exists to prevent)."""
    import json

    import pyarrow.parquet as pq

    out = str(tmp_path / "tgt")
    bench.gen_10x("/root/testdata/sf0.001", out, copies=3, tables=["documents"])
    with open(f"{out}/_gen_manifest.json") as fh:
        m = json.load(fh)
    assert m["replicated"] == ["documents"]
    assert "lineitem" in m["verbatim_1x"] and "orders" in m["verbatim_1x"]
    assert "nation" not in m["verbatim_1x"]  # dims are scale-invariant
    # verbatim copy carries explicit row-group sizing (not the pyarrow
    # default 1M-row groups): expected rows-per-16MB for the fixture
    md = pq.ParquetFile(f"{out}/lineitem.parquet").metadata
    base = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    rows_per_16mb = max(1024, int(base.num_rows * 16_000_000 / max(base.nbytes, 1)))
    expect_groups = -(-base.num_rows // rows_per_16mb)
    assert md.num_row_groups == expect_groups
