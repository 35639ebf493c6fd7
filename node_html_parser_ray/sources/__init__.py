from .corpus import INPUT_SCHEMA, SPAN_STRUCT, generate_documents, write_corpus

__all__ = ["INPUT_SCHEMA", "SPAN_STRUCT", "generate_documents", "write_corpus"]
