from data_pipelines_using_llm_spark.sinks.writers import (  # noqa: F401
    align_to_schema,
    append_with_evolution,
    compact_table,
    delta_available,
    ensure_table,
    idempotent_upsert,
    insert_into_existing,
    merge_schemas,
    read_evolved,
    register_view,
    write_bucketed,
    write_table,
)
