from radio_data_pipeline_spark.plans.registry import QuerySpec, all_queries, all_oracle_sql  # noqa: F401
