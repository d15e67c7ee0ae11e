"""Pipeline plans: config → DataFrame DAG compilers and the flagship
transcript pipeline."""

from loongcollector_spark.plans.transcript_pipeline import (  # noqa: F401
    TranscriptPipeline,
    ROLE_CLASS_DICT,
    TOOL_CLASS_DICT,
)
