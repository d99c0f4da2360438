from .compile import CompiledSchema, Compiler, compile_schema, validate
from .errors import Result, SchemaError, ValidationError, set_description
from .formats import FORMATS, FormatRegistry
from .model import canonical, is_integer, is_number, json_type_of, parse_json, to_fraction
from .refs import DRAFT4, DRAFT6, DRAFT7, HYBRID, Registry, load_json_file

__all__ = [
    "CompiledSchema", "Compiler", "compile_schema", "validate",
    "Result", "SchemaError", "ValidationError", "set_description",
    "FORMATS", "FormatRegistry",
    "canonical", "is_integer", "is_number", "json_type_of", "parse_json", "to_fraction",
    "DRAFT4", "DRAFT6", "DRAFT7", "HYBRID", "Registry", "load_json_file",
]
