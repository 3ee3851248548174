from .store import (
    FaiIndex,
    IndexedFastaStore,
    InMemoryFastaStore,
    encode_dna,
    encode_protein,
    revcomp_dna,
    DNA_ALPHABET_SIZE,
    PROTEIN_ALPHABET_SIZE,
)

__all__ = [
    "FaiIndex",
    "IndexedFastaStore",
    "InMemoryFastaStore",
    "encode_dna",
    "encode_protein",
    "revcomp_dna",
    "DNA_ALPHABET_SIZE",
    "PROTEIN_ALPHABET_SIZE",
]
