from radio_data_pipeline_spark.sources.parquet import TABLES, load_table, load_tables  # noqa: F401
