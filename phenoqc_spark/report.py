"""Markdown QC report derived from audit-table queries (engine analogue of
the reference's PDF/MD report, reference: src/phenoqc/reporting.py — the
visual/PDF layer is out of engine scope per SURVEY.md S13; this derives the
same summary numbers by querying the audit + triples tables)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.quality import quality_scores


def generate_report(
    spark: SparkSession,
    triples_path: str,
    audit_path: str,
    out_path: str,
    mapping_stats: DataFrame | None = None,
) -> str:
    triples = spark.read.parquet(triples_path)
    audit = spark.read.parquet(audit_path)
    agg = audit.agg(
        F.sum("n_pages").alias("pages"),
        F.sum("n_triples").alias("triples"),
        F.sum("missing_cells").alias("missing_cells"),
        F.sum("schema_violations").alias("violations"),
        F.countDistinct("part_key").alias("buckets"),
    ).collect()[0]
    top_preds = (
        triples.groupBy("pred").count().orderBy(F.desc("count"), F.asc("pred")).limit(20).collect()
    )
    lines = [
        "# QC Report",
        "",
        f"- pages processed: **{agg.pages:,}**",
        f"- triples emitted: **{agg.triples:,}**",
        f"- schema violations: **{agg.violations:,}**",
        f"- missing cells: **{agg.missing_cells:,}**",
        f"- completed partition buckets: **{agg.buckets}**",
        "",
        "## Triples per predicate (top 20)",
        "",
        "| pred | count |",
        "|---|---|",
    ]
    lines += [f"| {r.pred} | {r['count']:,} |" for r in top_preds]
    if mapping_stats is not None:
        lines += ["", "## Mapping success rates", "", "| column | ontology | total | mapped | rate % |", "|---|---|---|---|---|"]
        for r in mapping_stats.collect():
            lines.append(
                f"| {r.column} | {r.ontology} | {r.total_terms} | {r.mapped_terms} | {r.success_rate_pct} |"
            )
    content = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(content)
    return content
