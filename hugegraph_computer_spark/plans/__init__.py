from hugegraph_computer_spark.plans.checks import (
    explain_str,
    assert_pushed_filters,
    assert_broadcast_join,
    assert_no_cartesian,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "wholestage_codegen_spans",
]
