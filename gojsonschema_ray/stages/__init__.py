from .validate import TableValidator, VectorEvaluator, VIOLATION_SCHEMA, arrow_json_type

__all__ = ["TableValidator", "VectorEvaluator", "VIOLATION_SCHEMA", "arrow_json_type"]
