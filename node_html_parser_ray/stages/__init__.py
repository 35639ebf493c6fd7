from .classify import BoilerplateClassifier
from .extract_stage import (
    OUTPUT_SCHEMA,
    add_partition_column,
    extract_batch,
    make_extract_batch,
)
from .multimodal import MediaDecodeStage, fake_payload_batch
from .selector_stage import SelectorStage

__all__ = [
    "BoilerplateClassifier",
    "MediaDecodeStage",
    "OUTPUT_SCHEMA",
    "SelectorStage",
    "add_partition_column",
    "extract_batch",
    "fake_payload_batch",
    "make_extract_batch",
]
