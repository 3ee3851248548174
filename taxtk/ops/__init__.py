from .blosum import BLOSUM62, AA_ORDER
from .dna_align import batched_edit_distance, dna_alignment_stats
from .protein_align import batched_protein_align

__all__ = [
    "BLOSUM62",
    "AA_ORDER",
    "batched_edit_distance",
    "dna_alignment_stats",
    "batched_protein_align",
]
