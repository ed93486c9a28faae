from .readers import load_table, load_tables, read_raw_telemetry
from .writers import write_table

__all__ = ["load_table", "load_tables", "read_raw_telemetry", "write_table"]
