"""geographiclib_go_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch, Spark-first analytics engine whose geodesic kernels
reimplement Karney's algorithms (direct/inverse geodesic problems,
geodesic lines, polygon area, gnomonic projection) as vectorized numpy
batch functions exposed to Spark through Arrow ``pandas_udf``s — no
per-row Python anywhere in the hot path.

Reference semantics: pymaxion/geographiclib-go at /root/reference
(kernel contract documented in SURVEY.md; file:line citations in each
module's docstring). The relational/dataflow layer (cell index, spatial
joins, kNN, tiling, dedup, similarity search) is engine-added and
expressed as declarative DataFrame plans so Catalyst handles pushdown,
pruning and join selection.
"""

__version__ = "0.1.0"
