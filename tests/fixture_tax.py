"""Synthetic NCBI-style taxonomy fixture shared by tests.

Layout (taxid: rank):
  1: root (no rank)
  2: superkingdom Bacteria
    21: phylum Proteobacteria
      211: class Gammaproteobacteria
        2111: order Enterobacterales
          21111: family Enterobacteriaceae
            211111: genus Escherichia
              2111111: species Escherichia coli
                21111111: no rank (strain K-12)
              2111112: species Escherichia fergusonii
            211112: genus Salmonella
              2111121: species Salmonella enterica
        2112: no rank (unclassified Gammaproteobacteria)
          21121: species unclassified gamma sp.
    22: phylum Firmicutes
      221: class Bacilli
        2211: order Bacillales
          22111: family Bacillaceae
            221111: genus Bacillus
              2211111: species Bacillus subtilis
  3: superkingdom Archaea
    31: species Archaeon X   (rank-skipping lineage: species under superkingdom)
"""

NODES = [
    ("1", "1", "no rank"),
    ("2", "1", "superkingdom"),
    ("21", "2", "phylum"),
    ("211", "21", "class"),
    ("2111", "211", "order"),
    ("21111", "2111", "family"),
    ("211111", "21111", "genus"),
    ("2111111", "211111", "species"),
    ("21111111", "2111111", "no rank"),
    ("2111112", "211111", "species"),
    ("211112", "21111", "genus"),
    ("2111121", "211112", "species"),
    ("2112", "211", "no rank"),
    ("21121", "2112", "species"),
    ("22", "2", "phylum"),
    ("221", "22", "class"),
    ("2211", "221", "order"),
    ("22111", "2211", "family"),
    ("221111", "22111", "genus"),
    ("2211111", "221111", "species"),
    ("3", "1", "superkingdom"),
    ("31", "3", "species"),
]

NAMES = {
    "1": "root",
    "2": "Bacteria",
    "21": "Proteobacteria",
    "211": "Gammaproteobacteria",
    "2111": "Enterobacterales",
    "21111": "Enterobacteriaceae",
    "211111": "Escherichia",
    "2111111": "Escherichia coli",
    "21111111": "Escherichia coli K-12",
    "2111112": "Escherichia fergusonii",
    "211112": "Salmonella",
    "2111121": "Salmonella enterica",
    "2112": "unclassified Gammaproteobacteria",
    "21121": "gamma proteobacterium sp.",
    "22": "Firmicutes",
    "221": "Bacilli",
    "2211": "Bacillales",
    "22111": "Bacillaceae",
    "221111": "Bacillus",
    "2211111": "Bacillus subtilis",
    "3": "Archaea",
    "31": "Archaeon X",
}


def write_dump(dirpath):
    """Write nodes.dmp/names.dmp into dirpath; returns (nodes, names) paths."""
    import os

    nodes_path = os.path.join(dirpath, "nodes.dmp")
    names_path = os.path.join(dirpath, "names.dmp")
    with open(nodes_path, "w") as fh:
        for taxid, parent, rank in NODES:
            fh.write(f"{taxid}\t|\t{parent}\t|\t{rank}\t|\tx\t|\n")
    with open(names_path, "w") as fh:
        for taxid, name in NAMES.items():
            fh.write(f"{taxid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")
    return nodes_path, names_path


def make_taxonomy(tmpdir, ranks=None, prune=False):
    from taxtk.constants import DEFAULT_RANKS
    from taxtk.taxonomy import parse_ncbi_flat_files

    nodes, names = write_dump(str(tmpdir))
    tax = parse_ncbi_flat_files(nodes, names, "testver", ranks or DEFAULT_RANKS)
    if prune:
        tax = tax.prune_to_marked_ranks(ranks or DEFAULT_RANKS)
    return tax
