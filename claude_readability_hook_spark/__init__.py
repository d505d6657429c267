"""PySpark-native main-content extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
riii111/claude-readability-hook (reference at /root/reference): HTML
main-content extraction (Readability-style DOM scoring), code-block
placeholder preservation, StackOverflow / Reddit JSON formatting,
URL normalization, SSR-need detection, quality scoring with engine
fallback — re-expressed as a batch DataFrame pipeline over tables of
interleaved text + media spans, all per-document logic vectorized in
Arrow-batched pandas UDFs.

Layout:
  core/       pure-Python document logic (no Spark imports; unit-testable)
  functions/  pure Column expressions (JVM-side, whole-stage codegen)
  operators/  Spark operators (extraction, dedup, similarity, text stats,
              resume anti-join, lineage, skew salting)
  sources/    corpus synthesis + table-format seam (parquet/Iceberg)
  plans/      end-to-end job composition
  streaming/  Structured Streaming wrapper (foreachBatch reuse)
"""

__version__ = "0.1.0"
