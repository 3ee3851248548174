from .recordsets import iter_record_sets

__all__ = ["iter_record_sets"]
