"""Session-build preheat (session.py::_preheat): the background job that
warms the Python worker pool + codegen so the one-time session costs do
not land on whichever query happens to run first."""

import threading

from e_commerce_batch_etl_pipeline_spark.session import _preheat


def _join_preheat(timeout: float = 120.0) -> None:
    for t in threading.enumerate():
        if t.name == "spark-preheat":
            t.join(timeout=timeout)
            assert not t.is_alive(), "preheat thread did not finish"


def test_preheat_completes_and_session_stays_functional(spark):
    _preheat(spark)
    _join_preheat()
    # the session must be fully usable afterwards, including the Python
    # worker path the preheat exercised
    df = spark.range(10).mapInArrow(lambda bs: bs, "id long")
    assert df.count() == 10


def test_preheat_swallows_errors_from_a_dead_session():
    class Stopped:
        @property
        def sparkContext(self):
            raise RuntimeError("SparkContext was shut down")

    # must neither raise in the caller nor leave a crashed thread behind
    _preheat(Stopped())
    _join_preheat()
