"""WAL tail mode (CdcEngine.follow): epochs consumed as their segments
land, incomplete segments gate consumption, graceful stop."""

import os
import shutil
import threading
import time

from e_commerce_batch_etl_pipeline_spark.sources.datagen import (
    generate_base_docs,
    write_wal,
)
from e_commerce_batch_etl_pipeline_spark.sources.wal import WalSource
from e_commerce_batch_etl_pipeline_spark.streaming.bootstrap import (
    bootstrap_table,
)
from e_commerce_batch_etl_pipeline_spark.streaming.microbatch import CdcEngine


def _rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in df.collect()
    )


def _staged_wal(spark, root, epochs=4):
    """All segments generated up front into a staging dir; tests MOVE
    them into the live WAL (atomic rename = a completed upstream write,
    _SUCCESS marker included)."""
    stage = os.path.join(root, "stage_wal")
    write_wal(spark, stage, epochs, 120, 200, seed=21, max_len=8)
    live = os.path.join(root, "wal")
    os.makedirs(live, exist_ok=True)
    return stage, live


def _move(stage, live, epoch):
    name = f"epoch-{epoch:05d}"
    shutil.move(os.path.join(stage, name), os.path.join(live, name))


def _engine(spark, root, name="t"):
    base = generate_base_docs(spark, 200, seed=21, max_len=8)
    table = bootstrap_table(os.path.join(root, name), base, num_buckets=4)
    eng = CdcEngine(
        spark, table, WalSource(os.path.join(root, "wal")),
        os.path.join(root, f"ckpt_{name}"),
    )
    return table, eng


def test_follow_consumes_epochs_as_they_land(spark, tmpdir_clean):
    stage, live = _staged_wal(spark, tmpdir_clean)
    _move(stage, live, 0)
    _move(stage, live, 1)
    table, eng = _engine(spark, tmpdir_clean)

    def late_writer():
        time.sleep(2.0)
        _move(stage, live, 2)
        time.sleep(0.5)
        _move(stage, live, 3)

    w = threading.Thread(target=late_writer)
    w.start()
    results = eng.follow(poll_sec=0.3, idle_timeout_sec=6.0)
    w.join()
    assert [r.epoch for r in results] == [0, 1, 2, 3]
    assert all(r.status == "committed" for r in results)

    # final state equals a one-shot replay of the identical WAL
    ref_root = os.path.join(tmpdir_clean, "ref")
    os.makedirs(ref_root)
    base = generate_base_docs(spark, 200, seed=21, max_len=8)
    ref_table = bootstrap_table(
        os.path.join(ref_root, "t"), base, num_buckets=4
    )
    CdcEngine(
        spark, ref_table, WalSource(live),
        os.path.join(ref_root, "ckpt"),
    ).run()
    assert _rows(table.read(spark)) == _rows(ref_table.read(spark))


def test_follow_waits_for_incomplete_segment(spark, tmpdir_clean):
    stage, live = _staged_wal(spark, tmpdir_clean, epochs=3)
    _move(stage, live, 0)
    _move(stage, live, 1)
    _move(stage, live, 2)
    # simulate epoch 1 still being written: no _SUCCESS yet
    marker = os.path.join(live, "epoch-00001", "_SUCCESS")
    os.remove(marker)

    table, eng = _engine(spark, tmpdir_clean)
    results = eng.follow(poll_sec=0.2, idle_timeout_sec=1.0)
    # epoch 0 applied; epoch 2, though complete, waits BEHIND the gap
    assert [r.epoch for r in results] == [0]
    assert eng.last_committed_epoch() == 0

    with open(marker, "w"):
        pass  # upstream writer finishes
    results = eng.follow(poll_sec=0.2, idle_timeout_sec=1.0)
    assert [r.epoch for r in results] == [1, 2]
    assert all(r.status == "committed" for r in results)


def test_follow_stop_file_exits_promptly(spark, tmpdir_clean):
    stage, live = _staged_wal(spark, tmpdir_clean, epochs=2)
    _move(stage, live, 0)
    table, eng = _engine(spark, tmpdir_clean)
    stop = os.path.join(tmpdir_clean, "STOP")
    with open(stop, "w"):
        pass
    t0 = time.monotonic()
    results = eng.follow(poll_sec=5.0, stop_file=stop)
    assert results == []
    assert time.monotonic() - t0 < 2.0  # no poll sleep, no epoch applied


def test_two_followers_one_table_exactly_once(spark, tmpdir_clean):
    """Two tail engines (separate checkpoints) race the same WAL into
    ONE table: snapshot fences + the commit lock make every epoch land
    exactly once regardless of which engine wins it, and both tails
    drain to the same final state as a one-shot replay."""
    stage, live = _staged_wal(spark, tmpdir_clean)
    _move(stage, live, 0)
    base = generate_base_docs(spark, 200, seed=21, max_len=8)
    table = bootstrap_table(os.path.join(tmpdir_clean, "t"), base,
                            num_buckets=4)

    def follower(name):
        eng = CdcEngine(
            spark, table, WalSource(live),
            os.path.join(tmpdir_clean, f"ckpt_{name}"),
            merge_mode="mor", mor_compact_files=None,
        )
        return eng.follow(poll_sec=0.2, idle_timeout_sec=5.0)

    import concurrent.futures as cf

    def late_writer():
        for e in (1, 2, 3):
            time.sleep(1.0)
            _move(stage, live, e)

    w = threading.Thread(target=late_writer)
    w.start()
    with cf.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(follower, n) for n in ("a", "b")]
        results = [f.result() for f in futs]
    w.join()

    committed = [
        r.epoch for rs in results for r in rs if r.status == "committed"
    ]
    skipped = [
        r.epoch for rs in results for r in rs if r.status == "skipped"
    ]
    # every epoch committed EXACTLY once across both tails; the loser
    # of each race resolves to "skipped" at the fence check
    assert sorted(committed + skipped) and sorted(set(committed)) == \
        sorted(committed)
    assert set(committed) == {0, 1, 2, 3}

    ref_root = os.path.join(tmpdir_clean, "ref")
    os.makedirs(ref_root)
    ref_table = bootstrap_table(
        os.path.join(ref_root, "t"),
        generate_base_docs(spark, 200, seed=21, max_len=8), num_buckets=4,
    )
    CdcEngine(spark, ref_table, WalSource(live),
              os.path.join(ref_root, "ckpt")).run()
    assert _rows(table.read(spark)) == _rows(ref_table.read(spark))
