"""cloudvectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dorenwick/CloudVectorDB.

The reference (/root/reference/README.md:1-2) describes a 4-stage offline
vector-database construction pipeline: S1 build a triplet dataset, S2 train
encoders, S3 build embeddings with the encoder, S4 build the vectordb with
the encoder. This package rebuilds that capability Spark-first — DataFrame /
SQL declarative plans, Catalyst/AQE optimization, Arrow-batched Pandas UDFs
only where built-ins cannot express the semantics — plus the LLM-data-
pipeline operator surface (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale per SURVEY.md §2.
"""

__version__ = "0.1.0"
