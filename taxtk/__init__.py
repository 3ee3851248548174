"""taxtk — TPU-native taxonomic sequence-classification engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of taxator-tk
(reference: fungs/taxator-tk v1.5.0).  The hot compute path — batched pairwise
sequence alignment for the Realignment Placement Algorithm (RPA) — runs as
anti-diagonal wavefront DP kernels on TPU; the taxonomy lives as flattened
parent/depth/nested-set/path arrays so LCA and support scoring vectorize; the
surrounding toolkit (record streaming, consensus binning, taxonomy utilities,
pipelines) reproduces the reference's text-format contracts byte-for-byte.

Layer map (mirrors reference SURVEY.md section 1):
  formats/    text I/O: alignments TSV, GFF3 taxon ranges, bioboxes, NCBI dump
  taxonomy/   flattened taxonomy arrays + vectorized LCA/LCC/paths
  refpack/    FASTA access, .fai-compatible indexing, sequence encoding
  ops/        alignment kernels (JAX + Pallas TPU)
  models/     prediction models: RPA, LCA family
  engine/     record-set streaming + macro-batched executor
  binning/    sample-wide support + consensus binner
  parallel/   device mesh, sharding, collective merge
  cli/        drop-in command-line equivalents of the reference binaries
  pipeline/   end-to-end workflows (binning-blast / -last / -protein)
"""

__version__ = "0.1.0"

# version string reported by CLI tools; tracks reference behaviour parity
# (reference: core/src/constants.hh:46 program_version = "1.5.0")
REFERENCE_COMPAT_VERSION = "1.5.0"
