"""Operator library. Importing this package populates PROCESSOR_REGISTRY."""

from loongcollector_spark.operators.base import (  # noqa: F401
    PROCESSOR_REGISTRY,
    Pipeline,
    Processor,
    build_processor,
    compile_pipeline,
    register,
)
from loongcollector_spark.operators import convert, enrich, filters, parsers  # noqa: F401

# Optional modules registered on import; keep soft so a partial checkout
# still exposes the core set.
try:  # noqa: SIM105
    from loongcollector_spark.operators import splits  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from loongcollector_spark.operators import grok  # noqa: F401
except ImportError:  # pragma: no cover
    pass
