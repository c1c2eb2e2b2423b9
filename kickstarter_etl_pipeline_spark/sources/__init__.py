from kickstarter_etl_pipeline_spark.sources.readers import load_table, read_csv, read_parquet

__all__ = ["load_table", "read_csv", "read_parquet"]
