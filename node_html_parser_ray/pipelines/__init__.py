from .extraction import build_extraction_dataset, run_checkpointed

__all__ = ["build_extraction_dataset", "run_checkpointed"]
