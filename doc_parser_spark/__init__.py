"""doc_parser_spark — a from-scratch PySpark-native main-content extraction engine.

Re-expresses the extraction semantics of genonai/doc_parser (Docling fork +
GenOS preprocessor) as a columnar, Arrow-batched Spark pipeline over
transcript tables (conv_id, turn_idx, role, text, tool, ts).

Layout:
    functions/   pure-python extraction kernels (run inside Arrow UDF batches)
    sources/     content sniffing + synthetic transcript generation + readers
    operators/   Spark DataFrame operators (extract, chunk, dedup, similarity)
    plans/       end-to-end job assembly, metrics, checkpoint/resume
    streaming/   Structured Streaming variants
"""

__version__ = "0.1.0"
