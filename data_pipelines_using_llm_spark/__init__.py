"""PySpark-native data-pipeline & analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of ``motazsaad/Data-Pipelines-using-LLM`` (see SURVEY.md for the
file:line capability map), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Everything is expressed as DataFrame/SQL logical plans so Catalyst picks the
physical strategy; Python UDF paths are Arrow-vectorized and used only where
built-in operators can't express the semantics.
"""

from data_pipelines_using_llm_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
