"""Snapshot tags (Iceberg ref surface): named, retention-pinning
pointers to committed versions — time travel to a tag survives
aggressive expire + orphan GC."""

import json
import os

import pytest

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine
from e_commerce_batch_etl_pipeline_spark.tables.maintenance import (
    expire_snapshots,
    remove_orphans,
)


def _rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in df.collect()
    )


def _build(spark, root, epochs=4):
    base = generate_base_docs(spark, 150, seed=31, max_len=8)
    table = bootstrap_table(os.path.join(root, "t"), base, num_buckets=4)
    write_wal(spark, os.path.join(root, "wal"), epochs, 80, 150, seed=31,
              max_len=8)
    CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, "ckpt"),
    ).run()
    return table


def test_tag_pins_snapshot_through_expire_and_gc(spark, tmpdir_clean):
    table = _build(spark, tmpdir_clean)
    versions = table.history()
    mid = versions[len(versions) // 2]
    want = _rows(table.read(spark, snapshot=table.snapshot_at(mid)))
    table.tag("audit", version=mid)

    dropped = expire_snapshots(table, keep_last=1)
    kept = table.history()
    assert mid in kept and table.current().version in kept
    assert mid not in dropped
    # every untagged non-current older version is gone
    assert kept == sorted({mid, table.current().version})
    removed = remove_orphans(table, min_age_sec=0.0)
    # the tagged snapshot reads back bit-identically AFTER the GC pass
    assert _rows(
        table.read(spark, snapshot=table.snapshot_at("audit"))
    ) == want
    assert removed is not None  # GC ran; live files untouched by assert above


def test_drop_tag_releases_retention(spark, tmpdir_clean):
    table = _build(spark, tmpdir_clean, epochs=3)
    mid = table.history()[1]
    table.tag("pin", version=mid)
    expire_snapshots(table, keep_last=1)
    assert mid in table.history()
    table.drop_tag("pin")
    assert "pin" not in table.tags()
    expire_snapshots(table, keep_last=1)
    assert mid not in table.history()


def test_tag_validation_and_resolution(spark, tmpdir_clean):
    table = _build(spark, tmpdir_clean, epochs=2)
    cur = table.current().version
    assert table.tag("prod") == cur  # default: current
    assert table.tags() == {"prod": cur}
    assert table.ref("prod") == cur
    assert (
        table.snapshot_at("prod").version
        == table.snapshot_at(cur).version
    )
    with pytest.raises(ValueError):
        table.tag("../evil")
    with pytest.raises(ValueError):
        table.tag(".hidden")
    with pytest.raises(FileNotFoundError):
        table.tag("nope", version=10_000)
    table.drop_tag("absent")  # no-op, no raise


def test_cli_tag_subcommand(spark, tmpdir_clean, capsys):
    from e_commerce_batch_etl_pipeline_spark.cli import main

    table = _build(spark, tmpdir_clean, epochs=2)
    rc = main(["tag", "--table", table.root, "--name", "release-1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["tagged"] == "release-1"
    assert out["tags"]["release-1"] == table.current().version

    rc = main(["status", "--table", table.root])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tags"] == {"release-1": table.current().version}

    rc = main(["tag", "--table", table.root, "--name", "release-1",
               "--delete"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["tags"] == {}


def test_metadata_tables(spark, tmpdir_clean):
    """meta(): the Iceberg $files/$snapshots inspection surface — ops
    queries over table metadata as plain DataFrames, no data read."""
    from pyspark.sql import functions as F

    table = _build(spark, tmpdir_clean, epochs=3)
    table.tag("prod")
    snap = table.current()

    files = table.meta(spark, "files")
    assert files.count() == len(snap.files)
    per_bucket = {
        r["bucket"]: r["n"]
        for r in files.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    want = {}
    for f in snap.files:
        want[f["bucket"]] = want.get(f["bucket"], 0) + 1
    assert per_bucket == want
    assert files.filter("rows <= 0").count() == 0

    snaps = table.meta(spark, "snapshots")
    assert snaps.count() == len(table.history())
    assert (
        snaps.orderBy(F.desc("version")).first()["version"]
        == snap.version
    )

    fences = table.meta(spark, "fences")
    assert fences.count() == len(snap.fences)

    tags = table.meta(spark, "tags")
    assert [(r["name"], r["version"]) for r in tags.collect()] == [
        ("prod", snap.version)
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        table.meta(spark, "nope")


def test_cli_inspect_subcommand(spark, tmpdir_clean, capsys):
    from e_commerce_batch_etl_pipeline_spark.cli import main

    table = _build(spark, tmpdir_clean, epochs=2)
    rc = main(["inspect", "--table", table.root, "--what", "files",
               "--sql",
               "SELECT count(*) AS n, sum(rows) AS r FROM meta"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["rows"][0]["n"] == len(table.current().files)
    assert out["rows"][0]["r"] == sum(
        f["rows"] for f in table.current().files
    )
