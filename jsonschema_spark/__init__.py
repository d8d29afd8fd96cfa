"""jsonschema_spark — a PySpark-native schema + constraint validation engine.

Brand-new engine with the validator semantics of python-jsonschema
(reference at /root/reference, studied in SURVEY.md), re-expressed as
vectorized DataFrame operations: JSON-Schema constraint specs compile on
the driver into a DAG of native Column predicates (plus Arrow-batched
pandas UDFs where Python-exact semantics are required), evaluated in one
scan; dataset-level checks (stats, uniqueness, referential integrity,
distribution drift) lift the same keyword semantics to aggregations,
shuffles, and joins.
"""

from .compiler.registry import (KeywordRegistry, SchemaCompileError,
                                default_registry)
from .dataset import validate_dataset
from .functions.formats import register_format
from .pipeline import curate
from .spec import check_schema
from .validator import CompiledValidator, is_valid, validate

__all__ = [
    "CompiledValidator",
    "KeywordRegistry",
    "SchemaCompileError",
    "check_schema",
    "curate",
    "default_registry",
    "is_valid",
    "register_format",
    "validate",
    "validate_dataset",
]

__version__ = "0.1.0"
