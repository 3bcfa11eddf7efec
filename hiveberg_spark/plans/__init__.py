from hiveberg_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    read_schema_columns,
    assert_whole_stage_codegen,
    single_partition_offenders,
    all_pairs_offenders,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "assert_whole_stage_codegen",
    "single_partition_offenders",
    "all_pairs_offenders",
]
