from .fmt import cxx_float, cxx_double, parse_float32
from .errors import (
    TaxtkError,
    ParsingError,
    TaxonNotFound,
    SequenceNotFound,
    EOFError_,
    FileError,
)

__all__ = [
    "cxx_float",
    "cxx_double",
    "parse_float32",
    "TaxtkError",
    "ParsingError",
    "TaxonNotFound",
    "SequenceNotFound",
    "EOFError_",
    "FileError",
]
