"""schema_infer_plugin_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of ``akrishnanDG/schema-infer-plugin``
(reference at /root/reference, a single-process Kafka sampling CLI) as a distributed,
full-table validation engine over conversation-transcript tables:

* Pass A — **profile**: per-column schema/type profiles and stats (null-rate,
  distinct counts via HyperLogLog, min/max, quantile sketches, type histograms with
  the reference's exact type-lattice semantics) in a single wide aggregation per scan.
* Pass B — **checks**: uniqueness of (conv_id, turn_idx), turn_idx contiguity within
  conv_id (window), role/tool domain membership (broadcast anti-join), KL/PSI
  distribution drift vs a baseline profile — emitting typed violation rows and
  per-partition pass/fail verdicts.
* **datapipe**: large-scale training-data operations — exact/MinHash-LSH/SimHash
  dedup, n-gram Jaccard, embedding near-dup + ANN search, text quality/language/token
  analytics, multimodal binary-column plumbing.

Everything is expressed with the DataFrame API + built-in functions so Catalyst keeps
pushdown/pruning/codegen; Python appears only in Arrow-vectorized form (pandas UDFs /
mapInPandas) where semantics genuinely require dynamic per-record inspection.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
