from .readers import load_testdata, read_csv_table, read_parquet_table, read_stream_csv

__all__ = ["load_testdata", "read_csv_table", "read_parquet_table", "read_stream_csv"]
