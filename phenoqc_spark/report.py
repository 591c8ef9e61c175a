"""QC reports derived from audit-table queries (engine analogue of the
reference's PDF/MD report, reference: src/phenoqc/reporting.py).

Three renderers over the same audit/triples aggregates:

- :func:`generate_report` — Markdown (SURVEY.md S13 scope).
- :func:`generate_html_report` — self-contained HTML with inline-SVG bar
  charts (the numbers and chart content match reporting.py's visual
  summary: volume tiles, triples per predicate, mapping success rates).
  No external assets, deterministic output (no timestamps), native
  ``<title>`` tooltips per bar.
- :func:`generate_pdf_report` — the reference's PDF deliverable
  (reference: src/phenoqc/reporting.py:41-829), rendered through the
  dependency-free PDF 1.4 writer in :mod:`phenoqc_spark.pdfgen`
  (reportlab/kaleido are absent here): same tiles + bar charts as the
  HTML renderer, deterministic bytes.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.quality import quality_scores


def _graph_summary(graph_stats: DataFrame, top_n: int = 10):
    """Bounded driver-side summary of a graph-diagnostics frame
    (``run_kg_job --graph-stats`` output: entity, out_degree, in_degree
    [, n_triangles, clustering_coeff, rank]).  Returns (summary_pairs,
    top_hub_rows, top_rank_rows) — one aggregate + top-Ns, all
    entity-sized inputs already reduced by the graph operators, so
    collecting is safe.  ``top_rank_rows`` is empty unless a PageRank
    ``rank`` column is present."""
    cols = set(graph_stats.columns)
    total = (F.col("out_degree") + F.col("in_degree")).alias("total_degree")
    aggs = [
        F.count(F.lit(1)).alias("nodes"),
        F.max(F.col("out_degree") + F.col("in_degree")).alias("max_degree"),
        F.round(F.avg(F.col("out_degree") + F.col("in_degree")), 2).alias("avg_degree"),
    ]
    if "n_triangles" in cols:
        aggs.append((F.sum("n_triangles") / 3).cast("long").alias("triangles"))
    if "clustering_coeff" in cols:
        aggs.append(F.round(F.avg("clustering_coeff"), 4).alias("avg_clustering"))
    if "coreness" in cols:
        aggs.append(F.max("coreness").alias("max_coreness"))
    if "community" in cols:
        aggs.append(F.countDistinct("community").alias("n_communities"))
    row = graph_stats.agg(*aggs).collect()[0]
    summary = [
        ("graph nodes", f"{row.nodes:,}"),
        ("max degree", f"{row.max_degree:,}"),
        ("mean degree", f"{row.avg_degree}"),
    ]
    if "n_triangles" in cols:
        summary.append(("triangles", f"{row.triangles:,}"))
    if "clustering_coeff" in cols:
        summary.append(("mean clustering coeff", f"{row.avg_clustering}"))
    if "coreness" in cols:
        summary.append(("max coreness (k-core depth)", f"{row.max_coreness}"))
    if "community" in cols:
        summary.append(("communities (label propagation)", f"{row.n_communities:,}"))
    top = (
        graph_stats.select("entity", "out_degree", "in_degree", total)
        .orderBy(F.desc("total_degree"), F.asc("entity"))
        .limit(top_n)
        .collect()
    )
    top_rank = []
    if "rank" in cols:
        top_rank = (
            graph_stats.select("entity", "rank")
            .orderBy(F.desc("rank"), F.asc("entity"))
            .limit(top_n)
            .collect()
        )
    top_comm = []
    if "community" in cols:
        top_comm = (
            graph_stats.groupBy("community")
            .agg(F.count(F.lit(1)).alias("size"))
            .orderBy(F.desc("size"), F.asc("community"))
            .limit(top_n)
            .collect()
        )
    return summary, top, top_rank, top_comm


def _rollup_rows(term_rollup: DataFrame, top_n: int = 20):
    """Top ancestors by rolled-up record count (deterministic tiebreak)."""
    return (
        term_rollup.orderBy(F.desc("n"), F.asc("ancestor")).limit(top_n).collect()
    )


def _link_eval_tiles(link_eval):
    """(label, value) rows from the 1-row soft_link_pr scorecard."""
    ev = link_eval.collect()[0]
    return [
        ("produced links", f"{ev.n_produced:,}"),
        ("gold links", f"{ev.n_gold:,}"),
        ("exact matches", f"{ev.n_exact:,}"),
        ("precision (exact)", f"{ev.precision_exact:.4f}"),
        ("recall (exact)", f"{ev.recall_exact:.4f}"),
        ("precision (soft, Lin)", f"{ev.soft_precision:.4f}"),
        ("recall (soft, Lin)", f"{ev.soft_recall:.4f}"),
    ]


def generate_report(
    spark: SparkSession,
    triples_path: str,
    audit_path: str,
    out_path: str,
    mapping_stats: DataFrame | None = None,
    graph_stats: DataFrame | None = None,
    term_rollup: DataFrame | None = None,
    link_eval: DataFrame | None = None,
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
    if graph_stats is not None:
        summary, top, top_rank, top_comm = _graph_summary(graph_stats)
        lines += ["", "## Graph diagnostics", ""]
        lines += [f"- {k}: **{v}**" for k, v in summary]
        lines += [
            "",
            "### Hub entities (top 10 by degree)",
            "",
            "| entity | out | in | total |",
            "|---|---|---|---|",
        ]
        lines += [
            f"| {r.entity} | {r.out_degree:,} | {r.in_degree:,} | {r.total_degree:,} |"
            for r in top
        ]
        if top_rank:
            lines += [
                "",
                "### Top entities by PageRank",
                "",
                "| entity | rank |",
                "|---|---|",
            ]
            lines += [f"| {r.entity} | {r.rank:.6f} |" for r in top_rank]
        if top_comm:
            lines += [
                "",
                "### Largest communities (label propagation)",
                "",
                "| community | members |",
                "|---|---|",
            ]
            lines += [f"| {r.community} | {r.size:,} |" for r in top_comm]
    if term_rollup is not None:
        lines += [
            "",
            "## Subsumption rollup (top 20 ancestor terms)",
            "",
            "| ancestor term | records (incl. descendants) |",
            "|---|---|",
        ]
        lines += [f"| {r.ancestor} | {r.n:,} |" for r in _rollup_rows(term_rollup)]
    if link_eval is not None:
        lines += ["", "## Linking scorecard (vs gold)", ""]
        lines += [f"- {k}: **{v}**" for k, v in _link_eval_tiles(link_eval)]
    content = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(content)
    return content


def generate_curation_report(
    stage_report: dict,
    out_path: str,
    source_stats: DataFrame | None = None,
) -> str:
    """Markdown funnel report for :func:`phenoqc_spark.curation.curate_corpus`:
    per-stage survivor counts with drop rates (the dedup/filter audit a
    curation run needs), plus the optional per-source roll-up from
    :func:`phenoqc_spark.operators.textstats.corpus_source_stats`.

    ``stage_report`` is the dict curate_corpus returns — insertion order
    is stage order; ``None`` counts (lazy mode) render as em-dashes.
    ``source_stats`` has bounded cardinality (one row per crawl source),
    so collecting it is safe.
    """
    lines = [
        "# Curation Report",
        "",
        "## Stage funnel",
        "",
        "| stage | rows | delta | delta % |",
        "|---|---|---|---|",
    ]
    prev: int | None = None
    for stage, n in stage_report.items():
        if n is None:
            lines.append(f"| {stage} | — | — | — |")
            continue
        if prev is None or prev == 0:
            lines.append(f"| {stage} | {n:,} | — | — |")
        else:
            delta = n - prev
            lines.append(
                f"| {stage} | {n:,} | {delta:+,} | {100.0 * delta / prev:+.2f}% |"
            )
        prev = n
    # headline dedup rates: fraction of the PRE-stage corpus each dedup
    # stage removed (the numbers a crawl-curation review asks for first)
    dedup_lines = []
    prev_stage, prev_n = None, None
    for stage, n in stage_report.items():
        if (
            n is not None
            and prev_n
            and stage in ("url_dedup", "exact_dedup", "near_dedup", "paragraph_dedup")
        ):
            dedup_lines.append(
                f"- {stage} removed **{prev_n - n:,}** of {prev_n:,} docs "
                f"(**{100.0 * (prev_n - n) / prev_n:.2f}%** dup rate after {prev_stage})"
            )
        prev_stage, prev_n = stage, n
    if dedup_lines:
        lines += ["", "## Dedup rates", ""] + dedup_lines
    if source_stats is not None:
        cols = [c for c in source_stats.columns if c != "source"]
        lines += [
            "",
            "## Per-source stats",
            "",
            "| source | " + " | ".join(cols) + " |",
            "|---|" + "---|" * len(cols),
        ]
        for r in source_stats.orderBy("source").collect():
            vals = [
                f"{r[c]:,}" if isinstance(r[c], int) else str(r[c]) for c in cols
            ]
            lines.append(f"| {r.source} | " + " | ".join(vals) + " |")
    content = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(content)
    return content


# --- HTML report (inline SVG, no deps) -------------------------------------

_BAR_FILL = "#3987e5"  # validated sequential blue (single series, light surface)
_INK = "#1f2937"
_MUTED = "#6b7280"
_GRID = "#e5e7eb"


def _svg_hbar(rows, title, value_fmt="{:,.0f}", max_value=None, unit=""):
    """Horizontal bar chart as an inline SVG string.

    Single series → sequential hue, no legend (the title names it); thin
    bars with a rounded data end, direct value labels, native tooltips.
    """
    if not rows:
        return ""
    label_w, chart_w, bar_h, gap, pad = 220, 480, 16, 8, 8
    vmax = max_value if max_value is not None else max(v for _, v in rows) or 1
    h = pad * 2 + len(rows) * (bar_h + gap) + 24
    parts = [
        f'<svg role="img" aria-label="{_html.escape(title)}" width="{label_w + chart_w + 90}" '
        f'height="{h}" font-family="system-ui, sans-serif" font-size="12">',
        f'<text x="0" y="14" fill="{_INK}" font-weight="600">{_html.escape(title)}</text>',
    ]
    y = 24 + pad
    for label, value in rows:
        w = max(round(chart_w * value / vmax), 1 if value else 0)
        lab = _html.escape(str(label))
        val = value_fmt.format(value) + unit
        parts += [
            f'<text x="{label_w - 8}" y="{y + bar_h - 4}" text-anchor="end" fill="{_MUTED}">'
            f"{lab}</text>",
            f'<line x1="{label_w}" y1="{y - gap / 2}" x2="{label_w}" y2="{y + bar_h + gap / 2}" '
            f'stroke="{_GRID}"/>',
            f'<rect x="{label_w}" y="{y}" width="{w}" height="{bar_h}" rx="4" '
            f'fill="{_BAR_FILL}"><title>{lab}: {val}</title></rect>',
            f'<text x="{label_w + w + 6}" y="{y + bar_h - 4}" fill="{_INK}">{val}</text>',
        ]
        y += bar_h + gap
    parts.append("</svg>")
    return "\n".join(parts)


def generate_html_report(
    spark: SparkSession,
    triples_path: str,
    audit_path: str,
    out_path: str,
    mapping_stats: DataFrame | None = None,
    graph_stats: DataFrame | None = None,
    term_rollup: DataFrame | None = None,
    link_eval: DataFrame | None = None,
) -> str:
    """Self-contained HTML QC report (visual analogue of generate_report)."""
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
    tiles = [
        ("pages processed", f"{agg.pages:,}"),
        ("triples emitted", f"{agg.triples:,}"),
        ("schema violations", f"{agg.violations:,}"),
        ("missing cells", f"{agg.missing_cells:,}"),
        ("partition buckets", f"{agg.buckets:,}"),
    ]
    tile_html = "".join(
        f'<div style="border:1px solid {_GRID};border-radius:8px;padding:12px 16px;">'
        f'<div style="color:{_MUTED};font-size:12px;">{_html.escape(k)}</div>'
        f'<div style="color:{_INK};font-size:22px;font-weight:600;">{v}</div></div>'
        for k, v in tiles
    )
    sections = [
        f'<div style="display:flex;gap:12px;flex-wrap:wrap;margin-bottom:24px;">{tile_html}</div>',
        _svg_hbar([(r.pred, r["count"]) for r in top_preds], "Triples per predicate (top 20)"),
    ]
    if mapping_stats is not None:
        ms = mapping_stats.collect()
        sections.append(
            _svg_hbar(
                [(f"{r.column} → {r.ontology}", float(r.success_rate_pct)) for r in ms],
                "Mapping success rate",
                value_fmt="{:.1f}",
                max_value=100.0,
                unit="%",
            )
        )
        rows_html = "".join(
            f"<tr><td>{_html.escape(r.column)}</td><td>{_html.escape(r.ontology)}</td>"
            f"<td>{r.total_terms:,}</td><td>{r.mapped_terms:,}</td><td>{r.success_rate_pct}%</td></tr>"
            for r in ms
        )
        sections.append(
            f'<table style="border-collapse:collapse;margin-top:16px;color:{_INK};" border="1" '
            f'cellpadding="6"><tr><th>column</th><th>ontology</th><th>total</th>'
            f"<th>mapped</th><th>rate</th></tr>{rows_html}</table>"
        )
    if graph_stats is not None:
        summary, top, top_rank, top_comm = _graph_summary(graph_stats)
        g_tiles = "".join(
            f'<div style="border:1px solid {_GRID};border-radius:8px;padding:12px 16px;">'
            f'<div style="color:{_MUTED};font-size:12px;">{_html.escape(k)}</div>'
            f'<div style="color:{_INK};font-size:22px;font-weight:600;">{v}</div></div>'
            for k, v in summary
        )
        sections += [
            f'<h2 style="margin-top:32px;">Graph diagnostics</h2>'
            f'<div style="display:flex;gap:12px;flex-wrap:wrap;margin-bottom:24px;">{g_tiles}</div>',
            _svg_hbar(
                [(r.entity, r.total_degree) for r in top],
                "Hub entities (top 10 by degree)",
            ),
        ]
        if top_rank:
            sections.append(
                _svg_hbar(
                    [(r.entity, r.rank) for r in top_rank],
                    "Top entities by PageRank",
                    value_fmt="{:.4f}",
                )
            )
        if top_comm:
            sections.append(
                _svg_hbar(
                    [(str(r.community), r.size) for r in top_comm],
                    "Largest communities (label propagation)",
                )
            )
    if term_rollup is not None:
        sections.append(
            _svg_hbar(
                [(r.ancestor, r.n) for r in _rollup_rows(term_rollup)],
                "Subsumption rollup (top 20 ancestor terms)",
            )
        )
    if link_eval is not None:
        ev_tiles = "".join(
            f'<div style="border:1px solid {_GRID};border-radius:8px;padding:12px 16px;">'
            f'<div style="color:{_MUTED};font-size:12px;">{_html.escape(k)}</div>'
            f'<div style="color:{_INK};font-size:22px;font-weight:600;">{v}</div></div>'
            for k, v in _link_eval_tiles(link_eval)
        )
        sections.append(
            f'<h2 style="margin-top:32px;">Linking scorecard (vs gold)</h2>'
            f'<div style="display:flex;gap:12px;flex-wrap:wrap;margin-bottom:24px;">{ev_tiles}</div>'
        )
    content = (
        "<!doctype html>\n<html><head><meta charset='utf-8'><title>QC Report</title></head>\n"
        f'<body style="font-family:system-ui,sans-serif;max-width:900px;margin:32px auto;'
        f'color:{_INK};background:#ffffff;">\n<h1>QC Report</h1>\n'
        + "\n".join(s for s in sections if s)
        + "\n</body></html>\n"
    )
    with open(out_path, "w") as fh:
        fh.write(content)
    return content


# --- PDF report (pure-Python PDF 1.4, no deps) ------------------------------

_PDF_BAR = (0.22, 0.53, 0.9)
_PDF_INK = (0.12, 0.16, 0.22)
_PDF_MUTED = (0.42, 0.45, 0.5)
_PDF_GRID = (0.9, 0.91, 0.92)


def _pdf_hbar(canvas, y, rows, title, value_fmt="{:,.0f}", max_value=None, unit=""):
    """Draw a horizontal bar chart on ``canvas`` starting at top-offset
    ``y``; returns the y below the chart.  Mirrors :func:`_svg_hbar`."""
    from .pdfgen import PAGE_H, text_width

    if not rows:
        return y
    label_w, chart_w, bar_h, gap, left = 200, 260, 12, 7, 54
    canvas.text(left, y, title, size=12, bold=True, color=_PDF_INK)
    y += 18
    vmax = max_value if max_value is not None else max(v for _, v in rows) or 1
    for label, value in rows:
        if y > PAGE_H - 60:
            canvas.new_page()
            y = 60
        w = max(round(chart_w * value / vmax), 1 if value else 0)
        lab = str(label)
        while len(lab) > 3 and text_width(lab, 9) > label_w - 10:
            lab = lab[: len(lab) - 4] + "…"
        canvas.text(
            left + label_w - 6 - text_width(lab, 9), y + bar_h - 3, lab,
            size=9, color=_PDF_MUTED,
        )
        canvas.line(left + label_w, y - gap / 2, left + label_w, y + bar_h + gap / 2, _PDF_GRID)
        canvas.rect(left + label_w, y, w, bar_h, fill=_PDF_BAR)
        canvas.text(
            left + label_w + w + 5, y + bar_h - 3, value_fmt.format(value) + unit,
            size=9, color=_PDF_INK,
        )
        y += bar_h + gap
    return y + 16


def generate_pdf_report(
    spark: SparkSession,
    triples_path: str,
    audit_path: str,
    out_path: str,
    mapping_stats: DataFrame | None = None,
    graph_stats: DataFrame | None = None,
    term_rollup: DataFrame | None = None,
    link_eval: DataFrame | None = None,
) -> bytes:
    """PDF QC report — the reference's deliverable format (reporting.py:
    832-1081), same content as :func:`generate_html_report`.  Returns the
    PDF bytes (also written to ``out_path``); byte-deterministic."""
    from .pdfgen import PdfCanvas

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
    c = PdfCanvas()
    c.text(54, 60, "QC Report", size=20, bold=True, color=_PDF_INK)
    y = 92
    for k, v in [
        ("pages processed", f"{agg.pages:,}"),
        ("triples emitted", f"{agg.triples:,}"),
        ("schema violations", f"{agg.violations:,}"),
        ("missing cells", f"{agg.missing_cells:,}"),
        ("partition buckets", f"{agg.buckets:,}"),
    ]:
        c.text(54, y, k, size=10, color=_PDF_MUTED)
        c.text(200, y, v, size=10, bold=True, color=_PDF_INK)
        y += 15
    y += 14
    y = _pdf_hbar(c, y, [(r.pred, r["count"]) for r in top_preds], "Triples per predicate (top 20)")
    if mapping_stats is not None:
        ms = mapping_stats.collect()
        y = _pdf_hbar(
            c,
            y,
            [(f"{r.column} -> {r.ontology}", float(r.success_rate_pct)) for r in ms],
            "Mapping success rate",
            value_fmt="{:.1f}",
            max_value=100.0,
            unit="%",
        )
    if graph_stats is not None:
        summary, top, top_rank, top_comm = _graph_summary(graph_stats)
        from .pdfgen import PAGE_H

        if y > PAGE_H - 180:
            c.new_page()
            y = 60
        c.text(54, y, "Graph diagnostics", size=12, bold=True, color=_PDF_INK)
        y += 18
        for k, v in summary:
            c.text(54, y, k, size=10, color=_PDF_MUTED)
            c.text(200, y, v, size=10, bold=True, color=_PDF_INK)
            y += 15
        y += 14
        y = _pdf_hbar(
            c,
            y,
            [(r.entity, r.total_degree) for r in top],
            "Hub entities (top 10 by degree)",
        )
        if top_rank:
            y = _pdf_hbar(
                c,
                y,
                [(r.entity, r.rank) for r in top_rank],
                "Top entities by PageRank",
                value_fmt="{:.4f}",
            )
        if top_comm:
            y = _pdf_hbar(
                c,
                y,
                [(str(r.community), r.size) for r in top_comm],
                "Largest communities (label propagation)",
            )
    if term_rollup is not None:
        from .pdfgen import PAGE_H

        if y > PAGE_H - 180:
            c.new_page()
            y = 60
        y = _pdf_hbar(
            c,
            y,
            [(r.ancestor, r.n) for r in _rollup_rows(term_rollup)],
            "Subsumption rollup (top 20 ancestor terms)",
        )
    if link_eval is not None:
        from .pdfgen import PAGE_H

        if y > PAGE_H - 160:
            c.new_page()
            y = 60
        c.text(54, y, "Linking scorecard (vs gold)", size=12, bold=True, color=_PDF_INK)
        y += 18
        for k, v in _link_eval_tiles(link_eval):
            c.text(54, y, k, size=10, color=_PDF_MUTED)
            c.text(200, y, v, size=10, bold=True, color=_PDF_INK)
            y += 15
        y += 14
    data = c.build()
    with open(out_path, "wb") as fh:
        fh.write(data)
    return data
