from .tables import TESTDATA_TABLES, load_table, read_headerless_tsv, read_tsv_all_string

__all__ = ["TESTDATA_TABLES", "load_table", "read_headerless_tsv", "read_tsv_all_string"]
