"""Spark operators: extraction UDFs, dedup, similarity, text stats,
resume anti-join, lineage rollup, skew-aware repartitioning."""
