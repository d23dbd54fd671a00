"""sdk_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the JSON Structure validation semantics of the
``json-structure/sdk`` reference as compiled Spark DataFrame plans:
schema keywords lower to Catalyst ``Column`` predicates (fast path) or
Arrow-vectorized batch kernels (schema-flexible JSON fallback), and
per-instance error lists become violation-row DataFrames plus
per-partition verdicts.
"""

__version__ = "0.1.0"
