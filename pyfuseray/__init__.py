"""pyfuseray — a Ray-Data-native full-text index + query engine.

A from-scratch rebuild of the capabilities of kaloslazo/PyFuseDB
(SPIMI inverted index + TF-IDF/BM25 ranked retrieval + mini-SQL front
end) as idiomatic Ray Data pipelines over Arrow: map_batches actor
pools for analysis, a term-hash-partitioned groupby shuffle for posting
list assembly, delta+varbyte-compressed immutable Parquet segments with
block-max metadata, resumable per-partition builds via a JSON manifest,
and driver-side block-max-WAND top-k query execution.
"""

__version__ = "0.1.0"
