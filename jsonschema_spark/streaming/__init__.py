from .stateful import running_validity_counts
from .validate import (dedup_stream, run_validation_stream,
                       validate_dataset_stream, validate_stream,
                       windowed_manifest, with_valid_stream)

__all__ = [
    "dedup_stream",
    "run_validation_stream",
    "running_validity_counts",
    "validate_dataset_stream",
    "validate_stream",
    "windowed_manifest",
    "with_valid_stream",
]
