"""Measured ANN recall@k vs brute force at the bench scale factor.

Publishes the accuracy/cost trade-off for the two ANN paths as evidence
(BENCH/ANN.md):

- sign-LSH (``cosine_topk_lsh``): sweep ``n_planes`` — more planes =
  smaller buckets = faster candidate join, lower recall.
- IVF (``cosine_topk_ivf``, pinned codebook): sweep ``n_probe`` — more
  probed cells = more candidates = higher recall.

Ground truth is ``cosine_topk_bruteforce`` on the same queries.  Timings
use the bench protocol (warmed best-of-2); recall is averaged over
queries.  Usage: ``python scripts/bench_ann_recall.py`` (env: SF_DIR,
SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
K = 10
N_QUERIES = 50


def main() -> None:
    from pyspark.sql import functions as F

    from phenoqc_spark.ivf_codebook import IVF_CODEBOOK_8x64
    from phenoqc_spark.operators import similarity as S
    from phenoqc_spark.session import get_spark
    from phenoqc_spark.sources import load_table

    spark = get_spark(
        "ann-recall",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 4)),
                    "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    n_vecs = emb.count()
    qdf = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    def timed(make):
        best = None
        for _ in range(2):
            t0 = time.time()
            df = make()
            rows = df.collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return df, round(best, 3)

    gt_df, gt_sec = timed(lambda: S.cosine_topk_bruteforce(emb, qdf, k=K))
    gt = topk_sets(gt_df)

    results = []

    def record(name, setting, df, sec):
        got = topk_sets(df)
        recalls = [len(got.get(q, set()) & gt[q]) / len(gt[q]) for q in gt]
        results.append(
            {
                "method": name,
                "setting": setting,
                "recall_at_k": round(sum(recalls) / len(recalls), 4),
                "sec": sec,
            }
        )

    for n_planes in (8, 12, 16):
        df, sec = timed(lambda: S.cosine_topk_lsh(emb, qdf, dim=64, k=K, n_planes=n_planes))
        record("sign-LSH", f"n_planes={n_planes} (multi-probe 1-bit)", df, sec)

    for n_probe in (1, 2, 4, 8):
        df, sec = timed(
            lambda: S.cosine_topk_ivf(
                emb, qdf, k=K, n_probe=n_probe, centroids=IVF_CODEBOOK_8x64
            )
        )
        record("IVF (8x64 codebook)", f"n_probe={n_probe}/8", df, sec)

    # --- PQ: compressed codes + ADC, with and without exact re-rank ------
    from phenoqc_spark.pq_codebook import PQ_CODEBOOK_8x16x8

    codes = S.pq_encode(emb, PQ_CODEBOOK_8x16x8).persist()
    codes.count()
    df, sec = timed(lambda: S.cosine_topk_pq(codes, qdf, PQ_CODEBOOK_8x16x8, k=K))
    record("PQ ADC (8x16 codebook, 8B/vec)", "codes only", df, sec)
    df, sec = timed(
        lambda: S.cosine_topk_pq(
            codes, qdf, PQ_CODEBOOK_8x16x8, k=K, rerank=emb, rerank_factor=4
        )
    )
    record("PQ ADC + exact re-rank", "shortlist k*4", df, sec)
    codes.unpersist()

    # --- clustered corpus: the regime sign-LSH is FOR --------------------
    # 100 centers × 20 members, member≈center+small noise → a query's true
    # neighbors share its cluster and its bucket.  Deterministic (seed 7).
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.normal(size=(100, 64))
    cvecs = [
        (int(c * 20 + m), (centers[c] + rng.normal(size=64) * 0.05).astype(float).tolist())
        for c in range(100)
        for m in range(20)
    ]
    cemb = spark.createDataFrame(cvecs, "vec_id long, embedding array<float>").cache()
    cemb.count()
    cq = cemb.filter(F.col("vec_id") % 20 == 0).filter(F.col("vec_id") < 20 * 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cgt_df, cgt_sec = timed(lambda: S.cosine_topk_bruteforce(cemb, cq, k=K))
    cgt = topk_sets(cgt_df)
    for n_planes in (8, 12, 16):
        df, sec = timed(lambda: S.cosine_topk_lsh(cemb, cq, dim=64, k=K, n_planes=n_planes))
        got = topk_sets(df)
        recalls = [len(got.get(q, set()) & cgt[q]) / len(cgt[q]) for q in cgt]
        results.append(
            {
                "method": "sign-LSH (clustered corpus)",
                "setting": f"n_planes={n_planes} (multi-probe 1-bit)",
                "recall_at_k": round(sum(recalls) / len(recalls), 4),
                "sec": sec,
            }
        )

    lines = [
        "# BENCH/ANN — measured ANN recall@k vs brute force",
        "",
        f"Protocol: `scripts/bench_ann_recall.py` at `{SF_DIR}` "
        f"(local[{CPUS}], {n_vecs} vectors, dim 64, {N_QUERIES} queries, k={K}; "
        "warmed best-of-2 timings; ground truth = `cosine_topk_bruteforce`, "
        f"which took {gt_sec} s).",
        "",
        "| method | setting | recall@10 | sec |",
        "|---|---|---|---|",
    ]
    for r in results:
        lines.append(f"| {r['method']} | {r['setting']} | {r['recall_at_k']} | {r['sec']} |")
    lines += [
        "",
        "Reading: IVF recall climbs monotonically with probed cells and hits",
        "1.0 at n_probe = n_cells (then it IS brute force, partitioned); the",
        "recall/scan-fraction dial is n_probe/n_cells, and on a partitioned",
        "table the probes prune partitions",
        "(test_ivf_partitioned_scan_prunes_cells).  Sign-LSH recall is LOW on",
        "this corpus and falls as planes are added — expected, and worth",
        "stating plainly: the synthetic embeddings are near-isotropic (no",
        "cluster structure), so a query's true neighbors have only moderate",
        "cosine and straddle many hyperplane boundaries; 1-bit multi-probe",
        "cannot recover them.  PQ shows the same corpus effect: on isotropic",
        "vectors the quantization error is the same size as the (weak) true",
        "neighbor structure, so ADC recall is low and the k×4 re-rank can",
        "only recover what the shortlist caught; on clustered data the same",
        "operator measures ≥0.9 reranked (test_pq_encode_and_adc_recall).",
        "The clustered-corpus rows (100 centers × 20",
        "members, σ=0.05 — the regime web/doc embeddings actually live in)",
        "show the same operator with high recall: sign-LSH is the right tool",
        "for high-similarity/clustered regimes (embedding_near_dups uses it",
        "at threshold ≥0.95), while IVF is the production path for general",
        "top-k retrieval at moderate similarity.",
        "",
    ]
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "ANN.md"
    )
    # Preserve hand-written sections: only the auto-generated head (title,
    # protocol line, table, reading) is replaced; everything from the
    # first "Encode throughput" or "## " section after it survives.
    generated = "\n".join(lines)
    if os.path.exists(out_path):
        old = open(out_path).read()
        for marker in ("\nEncode throughput (separate measurement", "\n## Round"):
            if marker in old:
                generated = generated.rstrip("\n") + "\n" + old[old.index(marker) :]
                break
    with open(out_path, "w") as fh:
        fh.write(generated)
    print(json.dumps({"results": results, "gt_sec": gt_sec, "out": out_path}))
    spark.stop()


if __name__ == "__main__":
    main()
