from .explain import (
    assert_broadcast_join,
    assert_no_broadcast_hint,
    assert_no_python_row_udf,
    assert_pushed_filters,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_broadcast_hint",
    "assert_no_python_row_udf",
    "assert_pushed_filters",
    "physical_plan",
]
