from data_pipelines_using_llm_spark.sinks.writers import (  # noqa: F401
    align_to_schema,
    compact_table,
    ensure_table,
    idempotent_upsert,
    register_view,
    write_bucketed,
    write_table,
)
