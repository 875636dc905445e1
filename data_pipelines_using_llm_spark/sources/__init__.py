from data_pipelines_using_llm_spark.sources.tables import TABLE_NAMES, load_table, register_views  # noqa: F401
