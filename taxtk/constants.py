"""Framework-wide constants.

Mirrors the behavioural constants of the reference implementation
(reference: core/src/constants.hh:28-52) without copying code: these values
are part of the *text-format contract* (field separators, mask symbols, the
major-rank list) that both implementations must agree on.
"""

TAB = "\t"
ENDLINE = "\n"
FIELD_SEPARATOR = TAB
COMMENT_SYMBOL = "#"
MASK_SYMBOL = "*"

# The seven major NCBI ranks used for rank collapse and predictions
# (reference: core/src/constants.hh:32)
DEFAULT_RANKS = (
    "superkingdom",
    "phylum",
    "class",
    "order",
    "family",
    "genus",
    "species",
)

# Environment variable holding the NCBI taxonomy dump directory
# (reference: core/src/constants.hh:37)
ENVVAR_TAXONOMY_NCBI = "TAXATORTK_TAXONOMY_NCBI"

PROGRAM_VERSION = "1.5.0"

CITATION_NOTE = """
J. Dröge, I. Gregor, and A. C. McHardy
Taxator-tk: precise taxonomic assignment of metagenomes by fast approximation of evolutionary neighborhoods
Bioinformatics 2015 31: 817-824.
doi: 10.1093/bioinformatics/btu745
"""

# bioboxes.org binning format version written by the binner
# (reference: core/src/bioboxes.hh:90)
BIOBOXES_FORMAT_VERSION = "0.9.1"
