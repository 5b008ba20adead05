from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.exact import (
    dsum,
    davg,
    dsum_expr,
)

__all__ = ["dsum", "davg", "dsum_expr"]
