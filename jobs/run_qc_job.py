"""QC batch job: the Spark twin of the reference's `phenoqc` CLI
(reference: src/phenoqc/cli.py + batch_processing.py:200-999).

Per input file: load → validate (schema/duplicates/conflicts/anomalies)
→ impute → ontology-map to wide {ONTO}_ID columns → write processed CSV
+ a summary JSON line; optional Markdown/HTML report per run.

    spark-submit --py-files phenoqc_spark.zip jobs/run_qc_job.py \\
        --input data/*.csv --schema schema.json --config config.yaml \\
        --unique_identifiers SampleID --impute mean --output /out

Differences from the reference, by design: processing is distributed
(each file is a Spark job, not a pandas chunk loop), and the processed
CSV is a Spark CSV directory per input (pass --single-file to coalesce
to one part — fine for small files, not at scale).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="PhenoQC-Spark batch QC")
    ap.add_argument("--input", nargs="+", required=True,
                    help="input files/dirs/zips (csv, tsv, json)")
    ap.add_argument("--output", default="./reports/")
    ap.add_argument("--schema", required=True, help="JSON schema file")
    ap.add_argument("--config", default="config.yaml", help="YAML/JSON config")
    ap.add_argument("--custom_mappings", default=None)
    ap.add_argument("--impute", default=None,
                    choices=[None, "mean", "median", "mode", "knn", "mice", "svd", "none"],
                    help="override the config imputation strategy")
    ap.add_argument("--unique_identifiers", nargs="+", required=True)
    ap.add_argument("--ontologies", nargs="+", default=None,
                    help="override target ontologies for every phenotype column")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--offline", action="store_true")
    ap.add_argument("--single-file", action="store_true",
                    help="coalesce each processed CSV to one part")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from phenoqc_spark.api import DataValidator, ImputationEngine
    from phenoqc_spark.config import load_config
    from phenoqc_spark.ontology import TermResolver
    from phenoqc_spark.operators.triples import map_wide, mapping_stats, resolve_vocab, terms_long
    from phenoqc_spark.session import get_spark
    from phenoqc_spark.sources.readers import collect_input_files, load_data

    spark = get_spark("phenoqc-qc-job", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    cfg = load_config(args.config)
    if args.offline:
        cfg["offline"] = True
    custom = None
    if args.custom_mappings:
        custom = json.load(open(args.custom_mappings))
    resolver = TermResolver.from_config(cfg, custom)
    resolver_bc = spark.sparkContext.broadcast(resolver)
    schema = json.load(open(args.schema))

    pheno_cfg = cfg.get("phenotype_columns") or {}
    if args.ontologies:
        pheno_cfg = {c: list(args.ontologies) for c in pheno_cfg} or {}

    impute_cfg = dict(cfg.get("imputation") or {})
    if args.impute:
        impute_cfg["strategy"] = args.impute

    os.makedirs(args.output, exist_ok=True)
    files = collect_input_files(args.input, recursive=args.recursive)
    summaries = []
    for path in files:
        stem = os.path.splitext(os.path.basename(path))[0]
        df = load_data(spark, path)
        validator = DataValidator(
            df, schema, [c for c in args.unique_identifiers if c in df.columns]
        )
        results = validator.run_all_validations(cfg.get("quality") or {})
        flagged = results["Format Validation"]
        n_rows = df.count()
        n_violations = flagged.filter(flagged.SchemaViolationFlag).count()
        n_dups = results["Duplicate Records"].count()
        n_conflicts = results["Conflicting Records"].count()

        engine = ImputationEngine(impute_cfg, exclude_columns=args.unique_identifiers)
        imputed = engine.fit_transform(df)

        mapped = map_wide(
            imputed, pheno_cfg, resolver_bc, id_col=args.unique_identifiers[0]
        ) if pheno_cfg else imputed

        stats_rows = []
        if pheno_cfg:
            terms = terms_long(
                mapped.withColumn("_u", F.lit("")),
                [c for c in pheno_cfg if c in mapped.columns],
                [],
                id_col=args.unique_identifiers[0],
                url_col="_u",
            )
            links = resolve_vocab(terms, resolver_bc)
            stats_rows = [r.asDict() for r in mapping_stats(terms, links).collect()]

        out_dir = os.path.join(args.output, f"{stem}_processed.csv")
        writer = mapped.coalesce(1) if args.single_file else mapped
        writer.write.mode("overwrite").option("header", True).csv(out_dir)

        summaries.append(
            {
                "file": path,
                "rows": n_rows,
                "schema_violations": n_violations,
                "duplicates": n_dups,
                "conflicts": n_conflicts,
                "imputation": impute_cfg.get("strategy") or "none",
                "mapping_stats": stats_rows,
                "processed": out_dir,
            }
        )
        print(json.dumps(summaries[-1]))

    with open(os.path.join(args.output, "qc_summary.json"), "w") as fh:
        json.dump(summaries, fh, indent=1)
    print(json.dumps({"files": len(summaries), "output": args.output}))


if __name__ == "__main__":
    main()
