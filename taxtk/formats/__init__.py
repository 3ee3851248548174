from .alignments import AlignmentRecord, parse_alignment_line, iter_alignment_records
from .gff3 import PredictionRecord, GFF3_HEADER
from .mapping import load_seqid_taxid_mapping

__all__ = [
    "AlignmentRecord",
    "parse_alignment_line",
    "iter_alignment_records",
    "PredictionRecord",
    "GFF3_HEADER",
    "load_seqid_taxid_mapping",
]
