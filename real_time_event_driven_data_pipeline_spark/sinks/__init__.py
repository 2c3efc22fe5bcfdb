from .kv import SQLiteKVStore, serialize_row, write_kv_batch, write_kv_upsert

__all__ = ["SQLiteKVStore", "serialize_row", "write_kv_batch", "write_kv_upsert"]
