from .split import load_data_to_staging_tables

__all__ = ["load_data_to_staging_tables"]
