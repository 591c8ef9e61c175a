"""Library-API facades mirroring the reference's composable surface
(SURVEY.md §3.3): ``DataValidator(df, schema, ids).run_all_validations()``,
``ImputationEngine(cfg).fit_transform(df)``, ``OntologyMapper``-equivalent
``TermResolver`` — so the reference's pytest semantics port test-by-test.

Each facade composes the Spark-native operators; results are lazy
DataFrames (collect when needed), keyed exactly like the reference's
result dict (reference: src/phenoqc/validation.py:431-464,
missing_data.py:181-496).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame

from .operators import imputation as I
from .operators import quality as Q
from .operators import validation as V


class DataValidator:
    """Reference-shaped validator (validation.py:16-464) over a Spark DF."""

    def __init__(
        self,
        df: DataFrame,
        schema: dict,
        unique_identifiers: List[str],
        reference_data: Optional[DataFrame] = None,
        reference_columns: Optional[List[str]] = None,
    ) -> None:
        self.df = df
        self.schema = schema
        self.unique_identifiers = unique_identifiers
        self.reference_data = reference_data
        self.reference_columns = reference_columns or []

    def identify_duplicates(self) -> DataFrame:
        return V.duplicates(self.df, self.unique_identifiers)

    def detect_conflicts(self) -> DataFrame:
        return V.conflicts(self.df, self.unique_identifiers)

    def detect_anomalies(self) -> DataFrame:
        numeric = I.numeric_columns(self.df)
        if not numeric:
            return self.df.limit(0)
        return V.anomalies_zscore(self.df, numeric)

    def check_referential_integrity(self) -> Optional[DataFrame]:
        if self.reference_data is None or not self.reference_columns:
            return None
        out = None
        for col in self.reference_columns:
            if col not in self.df.columns or col not in self.reference_data.columns:
                continue
            issues = V.referential_integrity_issues(self.df, self.reference_data, col)
            out = issues if out is None else out.unionByName(issues).dropDuplicates()
        return out

    def run_all_validations(self, cfg: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Result dict keyed like the reference (validation.py:453-461)."""
        flagged = V.schema_violation_flag(self.df, self.schema)
        required = self.schema.get("required", [])
        integrity = V.required_missing(self.df, required) if required else self.df.limit(0)
        ref_issues = self.check_referential_integrity()
        results: Dict[str, Any] = {
            "Format Validation": flagged,
            "Duplicate Records": self.identify_duplicates(),
            "Conflicting Records": self.detect_conflicts(),
            "Integrity Issues": integrity,
            "Referential Integrity Issues": ref_issues,
            "Anomalies Detected": self.detect_anomalies(),
            "Cell Violations": V.cell_violations(
                self.df, self.schema, self.unique_identifiers
            ),
        }
        cfg = cfg or {}
        metrics = cfg.get("quality_metrics") or []
        if "accuracy" in metrics or "all" in metrics:
            results["Accuracy Issues"] = Q.check_accuracy(
                self.df, self.schema, self.unique_identifiers
            )
        if "redundancy" in metrics or "all" in metrics:
            rcfg = cfg.get("redundancy", {}) if isinstance(cfg.get("redundancy"), dict) else {}
            results["Redundancy Issues"] = Q.detect_redundancy(
                self.df,
                threshold=float(rcfg.get("threshold", 0.98)),
                method=str(rcfg.get("method", "pearson")),
            )
        if "traceability" in metrics or "all" in metrics:
            results["Traceability Issues"] = Q.check_traceability(
                self.df, self.unique_identifiers, cfg.get("source_column")
            )
        if "timeliness" in metrics or "all" in metrics:
            if cfg.get("date_col"):
                results["Timeliness Issues"] = Q.check_timeliness(
                    self.df, cfg["date_col"], cfg.get("max_lag_days", 0), cfg.get("now")
                )
        return results


class ImputationEngine:
    """Reference-shaped imputation engine (missing_data.py:181-496).

    cfg: {'strategy': 'mean|median|mode|knn|mice|svd|none',
          'params': {...}, 'per_column': {col: {'strategy':…, 'params':…}},
          'tuning': {'enable': bool, 'grid': …, 'mask_fraction': …,
                     'scoring': 'MAE'|'RMSE', 'max_cells': …,
                     'random_state': 42, 'sample_rows': 5000}}
    """

    def __init__(self, cfg: Optional[dict], exclude_columns: Optional[List[str]] = None):
        self.cfg = cfg or {}
        self.exclude_columns = list(exclude_columns or [])
        self.chosen_params: dict = {}
        self.tuning_summary: Optional[dict] = None

    def fit_transform(self, df: DataFrame) -> DataFrame:
        cfg = self.cfg
        strategy = cfg.get("strategy") or "none"
        params = dict(cfg.get("params") or {})
        per_column = cfg.get("per_column") or {}
        tuning = cfg.get("tuning") or {}

        if tuning.get("enable") and strategy in ("knn", "mice", "svd"):
            from .operators.diagnostics import tune_imputation

            numeric = [c for c in I.numeric_columns(df) if c not in self.exclude_columns]
            sample = (
                df.select(numeric)
                .limit(int(tuning.get("sample_rows", 5000)))
                .toPandas()
            )
            best = tune_imputation(
                sample,
                strategy,
                grid=tuning.get("grid"),
                mask_fraction=float(tuning.get("mask_fraction", 0.1)),
                scoring=str(tuning.get("scoring", "MAE")),
                max_cells=int(tuning.get("max_cells", 50000)),
                random_state=int(tuning.get("random_state", 42)),
            )
            if best.get("params"):
                params.update(best["params"])
            self.tuning_summary = {"enabled": True, "best": best.get("params"),
                                   "score": best.get("score"), "metric": best.get("metric")}
        elif tuning.get("enable"):
            self.tuning_summary = {
                "enabled": True,
                "note": f"tuning not implemented for strategy '{strategy}'",
            }

        field_strategies = {c: v.get("strategy", strategy) for c, v in per_column.items()}
        out = I.impute(
            df,
            strategy=strategy,
            field_strategies=field_strategies or None,
            params=params,
            exclude_columns=self.exclude_columns,
        )
        self.chosen_params = {
            "global": {"strategy": strategy, "params": params},
            "per_column": per_column,
        }
        return out
