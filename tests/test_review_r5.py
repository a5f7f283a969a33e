"""Round-5 self-review regressions (adversarial review of the r5 diff).

1. hyperplane_signature's dim=None probe must survive a ragged or null
   FIRST row: the probe takes the MODAL vector size, so the size==dim
   filter keeps the conforming majority instead of inverting (a
   first-row probe would set dim to the ragged length and keep exactly
   the malformed rows).
2. The driver-correctness-window bookkeeping: the first 50 registered
   queries are checked by the driver; everything past the cap must be a
   deliberately-listed _DRIVER_TAIL spill (the registry asserts this at
   import — here we pin the ordering property itself).
"""

from e_commerce_batch_etl_pipeline_spark.operators.similarity import (
    hyperplane_signature,
)


def test_hyperplane_dim_probe_takes_modal_size(spark):
    rows = [
        ("short", [1.0, 2.0, 3.0]),          # ragged FIRST row
        ("nullv", None),
        ("ok_a", [1.0, 2.0, 3.0, 4.0]),
        ("ok_b", [-1.0, 0.5, -2.0, 1.5]),
        ("ok_c", [0.1, 0.2, 0.3, 0.4]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )
    out = {r["vec_id"] for r in hyperplane_signature(df, planes=8).collect()}
    assert out == {"ok_a", "ok_b", "ok_c"}, out


def test_hyperplane_dim_probe_all_null_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="cannot infer dim"):
        hyperplane_signature(df, planes=4)


def test_driver_window_spill_is_deliberate():
    from e_commerce_batch_etl_pipeline_spark import queries

    names = list(queries.QUERIES)
    spilled = names[queries._DRIVER_WINDOW:]
    assert spilled == queries._DRIVER_TAIL, (
        "every query past the driver's window must be a deliberate "
        f"_DRIVER_TAIL entry; got spill={spilled}"
    )
    assert len(names) == len(queries.ORACLES)
