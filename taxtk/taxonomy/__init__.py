from .flat import FlatTaxonomy, load_taxonomy_from_environment, parse_ncbi_flat_files

__all__ = ["FlatTaxonomy", "load_taxonomy_from_environment", "parse_ncbi_flat_files"]
