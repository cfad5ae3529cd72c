"""User-facing facade over the index lifecycle (SURVEY.md §3.1 S4; the
"vectordb" a reference user actually drives day to day).

The registered queries are the verification surface; this module is the
ERGONOMIC surface — one object per persisted index that composes the
already-tested pieces:

    idx = VectorIndex.build(spark, emb_df, path, k=8)     # S4 bulk build
    idx = VectorIndex.open(spark, path)                   # reattach
    idx.search(probe_df, k=10)                            # pruned ANN
    idx.append(new_vectors)                               # delta ingest
    idx.compact(new_path)                                 # small-files GC
    idx.stats()                                           # cell balance

Everything delegates to operators.kmeans_det / operators.pipeline, so
the facade inherits their scale shapes (literal-matrix assignment,
partition-pruned probes, bounded driver state) and their determinism —
an index built here is bit-identical to the one the oracle CTEs replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VectorIndex:
    """A persisted IVF layout: partitioned vectors + centroid table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        vectors: DataFrame,
        path: str,
        k: int = 8,
        seed: int = 42,
        rounds: int | None = None,
    ) -> "VectorIndex":
        """S4 bulk build: deterministic Lloyd's + partitionBy write."""
        from cloudvectordb_spark.operators.pipeline import (
            _IVF_ROUNDS,
            build_ivf_assignments,
            write_ivf_index,
        )

        assigned, centroids = build_ivf_assignments(
            vectors, k=k, seed=seed, rounds=rounds or _IVF_ROUNDS
        )
        write_ivf_index(assigned, centroids, path)
        return cls(spark, path)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "VectorIndex":
        return cls(spark, path)

    # -- reads ---------------------------------------------------------
    @property
    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/vectors")

    def centroids(self) -> list:
        from cloudvectordb_spark.operators.pipeline import index_centroids

        return index_centroids(self.spark, self.path)

    def search(
        self, probes: DataFrame, k: int = 10, nprobe: int = 2,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Partition-pruned ANN: driver-side cell selection over the
        cached centroid list, literal isin pruning, BLAS exact top-k.
        Probe set must be bounded (it is collected)."""
        from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
        from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

        cents = self.centroids()
        rows = probes.select(id_col, vec_col).collect()
        cells = sorted(
            {c for r in rows for c in nearest_cells_py(r[vec_col], cents, nprobe)}
        )
        probes_local = self.spark.createDataFrame(
            [(r[id_col], r[vec_col]) for r in rows],
            schema=f"{id_col} long, {vec_col} array<float>",
        )
        pruned = self.vectors.filter(F.col("centroid_id").isin(cells))
        return exact_knn_fast(pruned, probes_local, k=k, id_col=id_col, vec_col=vec_col)

    def search_filtered(
        self, probes: DataFrame, predicate, k: int = 10, nprobe: int = 2,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Metadata-filtered ANN: the literal cell filter prunes parquet
        partitions AND ``predicate`` (a Column) pushes into the surviving
        scans before any vector math — the stacked pre-filter strategy
        (see operators.ivf2.filtered_ivf_knn for the verified query form)."""
        from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
        from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

        cents = self.centroids()
        rows = probes.select(id_col, vec_col).collect()
        cells = sorted(
            {c for r in rows for c in nearest_cells_py(r[vec_col], cents, nprobe)}
        )
        probes_local = self.spark.createDataFrame(
            [(r[id_col], r[vec_col]) for r in rows],
            schema=f"{id_col} long, {vec_col} array<float>",
        )
        pruned = self.vectors.filter(
            F.col("centroid_id").isin(cells) & predicate
        )
        return exact_knn_fast(pruned, probes_local, k=k, id_col=id_col, vec_col=vec_col)

    def stats(self) -> DataFrame:
        """Cell-balance health view (n_cells, min/max/avg, imbalance)."""
        sizes = self.vectors.groupBy("centroid_id").agg(F.count("*").alias("n"))
        return sizes.agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.min("n").cast("bigint").alias("min_cell"),
            F.max("n").cast("bigint").alias("max_cell"),
            F.round(F.avg("n"), 6).alias("avg_cell"),
            F.round(F.max("n") / F.avg("n"), 6).alias("imbalance"),
        )

    # -- writes --------------------------------------------------------
    def append(self, new_vectors: DataFrame) -> None:
        """Delta ingest against FROZEN centroids (work ∝ delta)."""
        from cloudvectordb_spark.operators.pipeline import append_to_ivf_index

        append_to_ivf_index(new_vectors, self.path)

    def compact(self, out_path: str) -> "VectorIndex":
        """Rewrite to one file per cell (small-files GC); returns the new
        index, leaving this one untouched (atomic publish)."""
        from cloudvectordb_spark.operators.pipeline import compact_ivf_index

        compact_ivf_index(self.spark, self.path, out_path)
        return VectorIndex(self.spark, out_path)
