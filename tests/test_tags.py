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
