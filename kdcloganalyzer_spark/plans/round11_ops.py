"""Round-11 additions: the embedding CLUSTERING report (the LLM-pipeline
brief's last uncovered verb) and further coverage widening.

Like every plans module: each operator is a ``@query`` registration with
a DuckDB oracle twin; money/measure aggregates accumulate EXACT INTEGER
units so hashes are summation-order-free (CLAUDE.md convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kdcloganalyzer_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Embedding clustering — per-cluster size / exact-integer inertia report
# ---------------------------------------------------------------------------

_KM_SCALE = 1 << 20  # similarity._LLOYD_SCALE — the shared quantum


def _km_report_oracle() -> str:
    from kdcloganalyzer_spark.operators.similarity import ivf_build_ctes

    s = _KM_SCALE
    return f"""
    WITH {ivf_build_ctes()},
    cq AS (
      SELECT cell,
             list_transform(c, x -> CAST(round(x * {s}) AS BIGINT)) AS cq
      FROM centers
    )
    SELECT a.cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CAST(list_sum(list_transform(
                 list_zip(list_transform(e.v,
                            x -> CAST(round(x * {s}) AS BIGINT)), cq.cq),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT))
                AS BIGINT) AS inertia_q,
           round(CAST(sum(CAST(list_sum(list_transform(
                 list_zip(list_transform(e.v,
                            x -> CAST(round(x * {s}) AS BIGINT)), cq.cq),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT))
                 AS DOUBLE) / (count(*) * {s}::DOUBLE * {s}::DOUBLE), 6)
             AS msd_r6
    FROM assign a
    JOIN e ON e.vec_id = a.vec_id
    JOIN cq ON cq.cell = a.cell
    GROUP BY a.cell
    """


@query("embed_cluster_kmeans_int", oracle=_km_report_oracle())
def embed_cluster_kmeans_int(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K-means EMBEDDING CLUSTERING report — per-cluster size and
    EXACT-INTEGER inertia over the engine-deterministic quantizer
    (Gonzalez farthest-point seeding + integer-Lloyd refinement,
    operators/similarity.build_ivf_index): the corpus-structure
    summary a training pipeline reads before choosing dedup/sampling
    strata. Inertia is hash-verifiable because every term is an
    integer: vectors and centroids both quantize to round(x·2^20)
    BIGINT micro-units, per-member squared distance is an integer
    fold, and the per-cell sum is order-free; `msd_r6` (mean squared
    distance in true units) is the single division of those exact
    integers, rounded at 6 digits. The DuckDB oracle replays seeding,
    Lloyd rounds, assignment, and the inertia fold bit-identically
    (ivf_build_ctes — the same CTE prefix the IVF search oracle uses).

    Scale: the index build amortizes across the whole ANN family via
    the per-(session, sf) _IVF_CACHE; the report itself is one codegen
    fold per row + one 16-row partial-agg'd shuffle. At 100 TB the
    build runs on a deterministic sample and the report streams over
    the assigned corpus — no driver materialization beyond the 16
    centroids. Quantized inertia headroom: unit-scale coords keep each
    member term ≤ 4·2^40, so BIGINT holds ~2^21 members/cell at this
    dim; shard the per-cell sum by a member-hash salt before the final
    merge beyond that."""
    from kdcloganalyzer_spark.operators.similarity import (
        _literal_matrix_exact,
    )
    from kdcloganalyzer_spark.plans.llm_pipeline import _ivf_index

    assigned, centers = _ivf_index(spark, sf_dir)
    s = _KM_SCALE
    cmat = _literal_matrix_exact(centers)
    cq = F.transform(
        F.element_at(cmat, F.col("cell").cast("int") + 1),
        lambda x: F.round(x * s).cast("long"),
    )
    qvec = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * s).cast("long"),
    )
    term = F.aggregate(
        F.zip_with(qvec, cq, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        assigned.select("cell", term.alias("iq"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum("iq").cast("bigint").alias("inertia_q"),
        )
        .select(
            "cell",
            "n_vectors",
            "inertia_q",
            F.round(
                F.col("inertia_q").cast("double")
                / (F.col("n_vectors") * float(s) * float(s)),
                6,
            ).alias("msd_r6"),
        )
    )
