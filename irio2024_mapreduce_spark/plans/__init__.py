from irio2024_mapreduce_spark.plans.pipeline import Pipeline, pandas_partition_step

__all__ = ["Pipeline", "pandas_partition_step"]
