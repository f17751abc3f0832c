"""cloud_ocr_summarizer_spark — a PySpark-native distributed main-content
extraction engine.

Re-expresses the capabilities of the reference single-process OCR/summarize
pipeline (crosscore/cloud-ocr-summarizer) as a Spark-first engine over tables
of interleaved text + media documents:

    (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)

Design pillars (see SURVEY.md):
  * DataFrame / Catalyst first — extraction is expressed with built-in
    higher-order functions (transform / filter / sort_array) so the whole
    hot path stays row-local inside WholeStageCodegen: ZERO shuffles.
  * Vectorized pandas/Arrow UDFs only where built-ins can't express the
    semantics (boilerplate classification scoring in "detailed" mode).
  * Explicit skew handling: salted repartition on hash(doc_id) before any
    batch UDF stage (media-heavy documents hot-spot partitions).
  * Lineage side-output: one metrics row per partition.
  * Batch-incremental resume: snapshot manifest + left_anti on doc_id.
"""

__version__ = "0.1.0"

from cloud_ocr_summarizer_spark.session import get_spark  # noqa: F401
