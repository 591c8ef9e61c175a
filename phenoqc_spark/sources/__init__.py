from .readers import load_data, read_csv, read_json, read_tsv
from .tables import load_table, TABLES

__all__ = ["load_table", "TABLES", "load_data", "read_csv", "read_tsv", "read_json"]
