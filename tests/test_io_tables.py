"""Table IO seam tests (parquet fallback of the Iceberg catalog seam)."""

from __future__ import annotations

from kgspark.io_tables import (
    PAGES_SCHEMA,
    TRIPLES_SCHEMA,
    iceberg_available,
    read_table,
    write_table,
)
from kgspark.synth import pages_df


def test_roundtrip_parquet(spark, tmp_path):
    base = str(tmp_path)
    df = pages_df(spark, 10, seed=3)
    write_table(df, base, "pages")
    back = read_table(spark, base, "pages")
    assert back.schema == PAGES_SCHEMA
    assert back.count() == 10
    # byte-identity survives the parquet round trip
    a = {r["url"]: r["text"] for r in df.collect()}
    b = {r["url"]: r["text"] for r in back.collect()}
    assert a == b


def test_bucket_by_fallback(spark, tmp_path):
    base = str(tmp_path)
    t = spark.createDataFrame(
        [("s", "p", "o", 1.0, None, "x", 0.8, True)],
        TRIPLES_SCHEMA,
    )
    write_table(t, base, "triples", bucket_by=(4, "subj"))
    assert read_table(spark, base, "triples").count() == 1


def test_append_mode(spark, tmp_path):
    base = str(tmp_path)
    df = pages_df(spark, 5, seed=1)
    write_table(df, base, "pages")
    write_table(df, base, "pages", mode="append")
    assert read_table(spark, base, "pages").count() == 10


def test_no_iceberg_in_sandbox(spark):
    assert not iceberg_available(spark)


def test_iceberg_branch_routes_catalog_identifiers(spark, monkeypatch):
    """No Iceberg jar in-sandbox, so the catalog branch is exercised with a
    mocked reader/writer: configuring spark.sql.catalog.kg must route
    read_table/write_table through `kg.<base>.<name>` identifiers (and
    mode=overwrite -> createOrReplace, append -> append)."""
    import pyspark.sql.readwriter as rw

    from kgspark.io_tables import iceberg_available, read_table, write_table

    spark.conf.set("spark.sql.catalog.kg", "org.apache.iceberg.spark.SparkCatalog")
    calls = {}
    try:
        assert iceberg_available(spark)

        def fake_read_table(self, ident):
            calls["read"] = ident
            return spark.range(1)

        monkeypatch.setattr(rw.DataFrameReader, "table", fake_read_table)
        read_table(spark, "db", "pages")
        assert calls["read"] == "kg.db.pages"

        class FakeWriter:
            def createOrReplace(self):
                calls["write"] = "createOrReplace"

            def append(self):
                calls["write"] = "append"

        def fake_write_to(self, ident):
            calls["ident"] = ident
            return FakeWriter()

        # patch the concrete class (pyspark.sql.classic) — patching the
        # abstract pyspark.sql.DataFrame base doesn't override its method
        monkeypatch.setattr(type(spark.range(1)), "writeTo", fake_write_to)
        write_table(spark.range(1), "db", "triples", mode="overwrite")
        assert calls["ident"] == "kg.db.triples"
        assert calls["write"] == "createOrReplace"
        write_table(spark.range(1), "db", "triples", mode="append")
        assert calls["write"] == "append"
    finally:
        spark.conf.unset("spark.sql.catalog.kg")


def test_partitioned_catalog_delete_prunes(spark, tmp_path):
    """Documents written via write_documents_catalog delete by rewriting ONE
    filename-hash partition; all other partition directories are untouched."""
    import os

    from kgspark.catalog import (
        N_CATALOG_BUCKETS,
        delete_document,
        write_documents_catalog,
    )

    path = str(tmp_path / "documents.parquet")
    df = spark.createDataFrame(
        [(f"doc{i}.json", f"content {i}") for i in range(200)],
        "filename string, content string",
    )
    write_documents_catalog(df, path)
    dirs = [d for d in os.listdir(path) if d.startswith("__fbucket=")]
    assert 1 < len(dirs) <= N_CATALOG_BUCKETS

    before = {d: os.stat(os.path.join(path, d)).st_mtime_ns for d in dirs}
    import zlib
    target = "doc7.json"
    tb = zlib.crc32(target.encode()) % N_CATALOG_BUCKETS
    n = delete_document(spark, path, target)
    assert n == 1
    out = spark.read.parquet(path)
    assert out.count() == 199
    assert out.where(out.filename == target).count() == 0
    after = {d: os.stat(os.path.join(path, d)).st_mtime_ns for d in dirs}
    changed = {d for d in dirs if before[d] != after[d]}
    assert changed == {f"__fbucket={tb}"}


def test_catalog_delete_staging_is_hidden_and_crash_recoverable(spark, tmp_path):
    """ADVICE r2: staging/backup dirs are dot-prefixed (invisible to Spark's
    partition discovery during the swap window) and a crashed prior delete —
    a stale '.bak_delete.*' with its primary missing — is auto-restored by
    the next call instead of failing or losing rows."""
    import os
    import shutil

    from kgspark.catalog import delete_document, write_documents_catalog

    path = str(tmp_path / "docs.parquet")
    df = spark.createDataFrame(
        [(f"doc{i}.json", f"content {i}") for i in range(50)],
        "filename string, content string",
    )
    write_documents_catalog(df, path)

    # simulate a crash mid-swap: primary partition renamed aside, tmp half-done
    import zlib

    from kgspark.catalog import N_CATALOG_BUCKETS

    target = "doc3.json"
    b = zlib.crc32(target.encode()) % N_CATALOG_BUCKETS
    pname = f"__fbucket={b}"
    os.rename(os.path.join(path, pname),
              os.path.join(path, f".bak_delete.{pname}"))
    os.makedirs(os.path.join(path, f".tmp_delete.{pname}"))

    # hidden dirs: a full-table read during the crash window still parses
    # (no bogus partition dirs) and sees every row except the renamed bucket
    readable = spark.read.parquet(path)
    assert "__fbucket" in readable.columns

    # next delete call recovers the original bucket, then deletes the row
    n = delete_document(spark, path, target)
    assert n == 1
    out = spark.read.parquet(path)
    assert out.count() == 49
    assert not [d for d in os.listdir(path) if d.startswith((".tmp", ".bak"))]
    shutil.rmtree(path)


def test_catalog_delete_unpartitioned_swap(spark, tmp_path):
    """Unpartitioned tables fall back to the full-table swap with SIBLING
    staging dirs; stale siblings from a crashed run are cleaned up first."""
    from kgspark.catalog import delete_document

    path = str(tmp_path / "flat.parquet")
    spark.createDataFrame(
        [("a.json", "x"), ("b.json", "y"), (None, "z")],
        "filename string, content string",
    ).write.parquet(path)
    # stale tmp sibling from a hypothetical crashed run
    import os

    os.makedirs(path + "/../.tmp_delete.flat.parquet", exist_ok=True)
    n = delete_document(spark, path, "a.json")
    assert n == 1
    out = spark.read.parquet(path)
    assert out.count() == 2
    # NULL-filename row preserved
    assert out.where(out.filename.isNull()).count() == 1


def test_write_bucketed_join_and_agg_are_shuffle_free(spark, tmp_path):
    """The 100 TB co-location claim, executed: two tables bucketed by the
    same key join with ZERO Exchange operators (broadcast disabled so the
    absence is bucketing, not a broadcast), and a groupBy on the bucket
    key aggregates without its exchange."""
    from kgspark.io_tables import write_bucketed

    a = spark.range(0, 200).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 200).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "kb_bkt_a", str(tmp_path / "a"), ["k"], n_buckets=4)
    write_bucketed(b, "kb_bkt_b", str(tmp_path / "b"), ["k"], n_buckets=4)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("kb_bkt_a").join(spark.table("kb_bkt_b"), "k")
            p = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in p, p
            assert j.count() == 200
            g = (
                spark.table("kb_bkt_a").groupBy("k")
                .agg({"va": "sum"})
            )
            pg = g._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in pg, pg
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS kb_bkt_a")
        spark.sql("DROP TABLE IF EXISTS kb_bkt_b")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(a, "x", str(tmp_path / "x"), [])


def test_compact_table_merges_small_files(spark, tmp_path):
    import os
    from kgspark.io_tables import compact_table

    path = str(tmp_path / "t")
    spark.range(0, 1000).selectExpr("id", "id * 7 AS v").repartition(
        16
    ).write.parquet(path)
    n0 = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n0 == 16
    stats = compact_table(spark, path, target_bytes=1 << 30)
    assert stats["compacted"] and stats["files_before"] == 16
    assert stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.selectExpr("sum(v)").first()[0] == 7 * sum(range(1000))
    # no staging/backup leftovers
    assert not [f for f in os.listdir(str(tmp_path))
                if "compact" in f]
    # idempotent: second run is a no-op
    again = compact_table(spark, path, target_bytes=1 << 30)
    assert not again["compacted"] and again["files_after"] == 1


def test_compact_table_respects_target_and_recovers(spark, tmp_path):
    import os
    from kgspark.io_tables import compact_table

    path = str(tmp_path / "t2")
    spark.range(0, 10000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).repartition(20).write.parquet(path)
    sizes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    stats = compact_table(spark, path, target_bytes=sizes // 3)
    assert stats["compacted"]
    assert 3 <= stats["files_after"] <= 4  # ceil(total/target) + rounding
    assert spark.read.parquet(path).count() == 10000

    # simulate a crash after the original was renamed to backup: the
    # next compact restores it before doing anything else
    os.rename(path, str(tmp_path / ".bak_compact.t2"))
    stats2 = compact_table(spark, path, target_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 10000
    # recovery saw the restored 3-4-file table, then compacted it to 1
    assert stats2["compacted"] and stats2["files_after"] == 1
    assert stats2["files_before"] == stats["files_after"]


def test_append_check_reports_drift(spark, tmp_path):
    from kgspark.io_tables import append_check

    path = str(tmp_path / "t3")
    spark.range(5).selectExpr("id", "id * 2 AS v", "'x' AS s").write.parquet(path)
    same = spark.range(2).selectExpr("id", "id * 3 AS v", "'y' AS s")
    assert append_check(same, spark, path) == {
        "ok": True, "missing": [], "extra": [], "type_changed": []}
    drift = spark.range(2).selectExpr(
        "id", "cast(id AS string) AS v", "'z' AS q"
    )
    rep = append_check(drift, spark, path)
    assert not rep["ok"]
    assert rep["missing"] == ["s"] and rep["extra"] == ["q"]
    assert rep["type_changed"] == ["v"]


def test_run_report_stage_rows_and_skew(spark, tmp_path):
    from kgspark.checkpoint import Manifest, run_stage, run_report

    m = Manifest(str(tmp_path))
    run_stage(spark, m, "s1", "fp",
              lambda: spark.range(100).selectExpr("id"))
    rep = {r.stage: r for r in run_report(spark, str(tmp_path)).collect()}
    assert rep["s1"].rows == 100 and rep["s1"].n_partitions >= 1
    assert rep["s1"].skew_ratio_ppm >= 1_000_000  # max >= fair share
    assert rep["s1"].elapsed_sec > 0


def test_zorder_key_and_write(spark, tmp_path):
    from kgspark.io_tables import zorder_key, zorder_write

    # full 64x64 grid, bits=6 -> buckets are the coordinates themselves
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    keyed = zorder_key(df, "a", "b", bits=6)
    got = {(r.a, r.b): r["__z"] for r in keyed.collect()}

    def z_py(a, b, bits=6):
        z = 0
        for i in range(bits):
            z += ((a >> i) & 1) << (2 * i + 1)
            z += ((b >> i) & 1) << (2 * i)
        return z

    # min=0, max=63: bucket = (x * 64) // 64 = x  -> pure interleave
    for (a, b), z in got.items():
        assert z == z_py(a, b), (a, b, z)

    # layout quality: Z-clustered files bound BOTH dimensions; a 1-D sort
    # leaves the other dimension spanning the full range in every file
    zdir = str(tmp_path / "zorder")
    zorder_write(df, zdir, "a", "b", bits=6, num_files=16)
    back = spark.read.parquet(zdir)
    assert back.count() == 64 * 64 and set(back.columns) == {"a", "b"}
    import os
    from pyspark.sql import functions as F

    files = [f for f in os.listdir(zdir) if f.endswith(".parquet")]
    assert len(files) > 4
    both_tight = 0
    for f in files:
        st = spark.read.parquet(os.path.join(zdir, f)).agg(
            F.min("a"), F.max("a"), F.min("b"), F.max("b")).collect()[0]
        aspan = (st[1] - st[0]) / 63.0
        bspan = (st[3] - st[2]) / 63.0
        if aspan <= 0.51 and bspan <= 0.51:
            both_tight += 1
    assert both_tight >= len(files) // 2, (both_tight, len(files))


def test_merge_table_upsert_insert_delete(spark, tmp_path):
    import pytest as _pytest

    from kgspark.io_tables import merge_table

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    ).write.parquet(path)
    upd = spark.createDataFrame(
        [(2, "B", 99.0, False), (4, "d", 40.0, False), (3, None, 0.0, True)],
        "k long, name string, v double, is_delete boolean",
    )
    out = merge_table(spark, path, upd, ["k"], delete_col="is_delete")
    got = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}
    assert out["rows_after"] == 3
    # ambiguous batch rejected
    bad = spark.createDataFrame(
        [(5, "x", 1.0, False), (5, "y", 2.0, False)],
        "k long, name string, v double, is_delete boolean",
    )
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_table(spark, path, bad, ["k"], delete_col="is_delete")
    # schema drift rejected
    drift = spark.createDataFrame([(6, "z")], "k long, name string")
    with _pytest.raises(ValueError, match="update schema"):
        merge_table(spark, path, drift, ["k"])
    # untouched after failures
    assert spark.read.parquet(path).count() == 3


def test_snapshot_write_append_overwrite_time_travel(spark, tmp_path):
    from kgspark.io_tables import (
        read_snapshot,
        snapshot_versions,
        snapshot_write,
    )

    d = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    df3 = spark.createDataFrame([(9, "z")], "id long, v string")
    assert snapshot_write(df1, spark, d) == 1
    assert snapshot_write(df2, spark, d, mode="append") == 2
    assert snapshot_write(df3, spark, d, mode="overwrite") == 3
    assert snapshot_versions(spark, d) == [1, 2, 3]
    # time travel: v1 = 2 rows, v2 = union, v3 = overwrite only
    assert read_snapshot(spark, d, 1).count() == 2
    got2 = {r.id for r in read_snapshot(spark, d, 2).collect()}
    assert got2 == {1, 2, 3}
    assert {r.id for r in read_snapshot(spark, d).collect()} == {9}
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, d, 7)
    with _pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))
    with _pytest.raises(ValueError):
        snapshot_write(df1, spark, d, mode="merge")


def test_snapshot_orphan_data_invisible(spark, tmp_path):
    from kgspark.io_tables import read_snapshot, snapshot_write

    d = str(tmp_path / "tbl2")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    snapshot_write(df1, spark, d)
    # simulate a crashed writer: data landed, manifest never published
    orphan = spark.createDataFrame([(666, "orphan")], "id long, v string")
    orphan.write.parquet(str(tmp_path / "tbl2" / "data" / "v2"))
    got = {r.id for r in read_snapshot(spark, d).collect()}
    assert got == {1}
    # next successful write claims v2's slot is taken? NO — versions
    # come from manifests, so the writer reuses v2 and overwrites the
    # orphan directory
    from kgspark.io_tables import snapshot_versions
    n = snapshot_write(orphan, spark, d, mode="append")
    assert n == 2 and snapshot_versions(spark, d) == [1, 2]
    assert {r.id for r in read_snapshot(spark, d).collect()} == {1, 666}


def test_parquet_stats_footer_census(spark, tmp_path):
    import pytest as _pytest

    from kgspark.io_tables import parquet_stats

    tdir = str(tmp_path / "t")
    spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS k", "cast(id as string) AS s"
    ).repartition(4).write.parquet(tdir)
    out = parquet_stats(spark, tdir).collect()
    data = [r for r in out if r.error is None]
    assert len(data) >= 1
    assert sum(r.n_rows for r in data) == 1000
    assert all(r.n_cols == 3 for r in data)
    assert all(r.size_bytes > 0 for r in data)
    assert all(0 < r.min_rg_rows <= r.max_rg_rows <= r.n_rows
               for r in data)
    # a corrupt .parquet file reports an error row, not a crash
    bad = tmp_path / "t" / "part-corrupt.parquet"
    bad.write_bytes(b"not a parquet file")
    out2 = {r.file.split("/")[-1]: r for r in
            parquet_stats(spark, tdir).collect()}
    assert out2["part-corrupt.parquet"].error is not None
    assert sum(r.n_rows or 0 for r in out2.values()) == 1000
    # hidden/_SUCCESS files are never listed
    assert not any(f.startswith("_") for f in out2)
    with _pytest.raises(FileNotFoundError):
        parquet_stats(spark, str(tmp_path / "missing"))
    # empty dir -> empty frame with the full schema
    (tmp_path / "empty").mkdir()
    assert parquet_stats(spark, str(tmp_path / "empty")).count() == 0
