"""Statistical-dataflow operators (reference: src/*.jl stages, re-expressed Spark-first)."""
