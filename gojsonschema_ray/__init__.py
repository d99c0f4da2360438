"""gojsonschema_ray — a Ray-Data-native schema + constraint validation engine.

Subsumes xeipuuv/gojsonschema's JSON Schema draft-4/6/7 semantics, re-expressed
as compiled constraint trees evaluated vectorized over Arrow batches via
``ray.data.Dataset.map_batches``, plus dataset-level checks (column stats
sketches, uniqueness, referential integrity, distribution drift, dedup,
similarity search) that a per-document engine cannot express.
"""

from .schema import (
    DRAFT4, DRAFT6, DRAFT7, HYBRID,
    CompiledSchema, Compiler, FORMATS, Registry, Result, SchemaError,
    ValidationError, compile_schema, parse_json, validate,
)

__version__ = "0.1.0"
