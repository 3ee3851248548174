"""GFF3 taxon-range records (the taxator output format).

Contract (reference: doc/fileformats.md:36-57, core/src/predictionrecord.hh):
  qid  taxator-tk  sequence_feature  begin  end  score  .  .  attrs
with attrs `seqlen=<n>;tax=<low:sup-...-high[:sup]>;rtax=<taxid>[;ival=<v>]`.
The tax path is run-length encoded: nodes whose support equals the previously
printed support are omitted and reconstructed from the taxonomy on parse
(reference: predictionrecord.hh:291-308 print, :322-371 parse).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..constants import TAB
from ..utils.errors import ParsingError
from ..utils.fmt import cxx_float
from ..utils.tokenize import tokenize_single_char
from ..taxonomy.flat import FlatTaxonomy

GFF3_HEADER = "##gff-version 3"

BINNING_NONE = 0
BINNING_SINGLE = 1
BINNING_DIRECT = 2
BINNING_FALLBACK = 3


class PredictionRecord:
    """A taxon-range prediction for one query feature.

    taxon_support[0] is the support at the upper node's depth, the last entry
    the support at the lower node (reference: predictionrecord.hh:72-87).

    __slots__ keeps the per-record footprint small: the binner holds every
    sample record in memory for sample-wide support accounting (same
    O(records) design as reference binner.cpp STEP 0), so at config-5
    scale (1M records) the dict-per-object overhead would dominate RSS.
    """

    __slots__ = (
        "tax",
        "query_identifier",
        "query_length",
        "query_feature_begin",
        "query_feature_end",
        "lower_node",
        "upper_node",
        "rtax",
        "interpolation_value",
        "signal_strength",
        "taxon_support",
        "binning_type",
    )

    def __init__(self, tax: FlatTaxonomy):
        self.tax = tax
        self.query_identifier: str = ""
        self.query_length: int = 0
        self.query_feature_begin: int = 0
        self.query_feature_end: int = 0
        self.lower_node: int = -1
        self.upper_node: int = -1
        self.rtax: int = -1
        # -1 sentinel = "unset"; persisted across records in the reference's
        # record-reuse pattern (see models/rpa.py serial-parity notes)
        self.interpolation_value: float = -1.0
        self.signal_strength: float = 0.0
        self.taxon_support: List[int] = []
        self.binning_type: int = BINNING_NONE

    # ------------------------------------------------------------------ setters
    def initialize(self, query_identifier: str, query_length: int):
        self.query_identifier = query_identifier
        self.query_length = query_length
        self.query_feature_begin = 1
        self.query_feature_end = query_length

    @property
    def feature_width(self) -> int:
        return self.query_feature_end - self.query_feature_begin + 1

    def set_node_range(
        self,
        lower_node: int,
        upper_node: int,
        support: int | None = None,
        lower_support: int | None = None,
        upper_support: int | None = None,
    ):
        """reference: predictionrecord.hh:152-158"""
        if support is not None:
            lower_support = upper_support = support
        if lower_support is None:
            lower_support = upper_support = self.feature_width
        self.lower_node = int(lower_node)
        self.upper_node = int(upper_node)
        span = int(self.tax.depth[lower_node]) - int(self.tax.depth[upper_node]) + 1
        self.taxon_support = [int(upper_support)] * span
        self.taxon_support[-1] = int(lower_support)

    def set_node_point(self, node: int, support: int | None = None):
        if support is None:
            support = self.feature_width
        self.set_node_range(node, node, lower_support=support, upper_support=support)

    def get_support_at(self, node_or_depth) -> int:
        """reference: predictionrecord.hh:72-87 (note: the out-of-range
        extension below the lower node always returns the last entry)."""
        depth = int(node_or_depth) if np.isscalar(node_or_depth) else int(node_or_depth)
        index = depth - int(self.tax.depth[self.upper_node])
        if index >= 0:
            if index < len(self.taxon_support):
                return self.taxon_support[index]
            return self.taxon_support[-1]
        return 0

    def get_support_at_node(self, node: int) -> int:
        return self.get_support_at(int(self.tax.depth[int(node)]))

    def set_support_at(self, node: int, support: int):
        index = int(self.tax.depth[int(node)]) - int(self.tax.depth[self.upper_node])
        self.taxon_support[index] = int(support)

    def prune_lower_node(self, node: int):
        """reference: predictionrecord.hh:178-182"""
        span = int(self.tax.depth[node]) - int(self.tax.depth[self.upper_node]) + 1
        del self.taxon_support[span:]
        self.lower_node = int(node)

    # ------------------------------------------------------------ serialization
    def print_line(self) -> str:
        tax = self.tax
        cols = [
            self.query_identifier,
            "taxator-tk",
            "sequence_feature",
            str(self.query_feature_begin),
            str(self.query_feature_end),
            "." if math.isnan(self.signal_strength) else cxx_float(self.signal_strength),
            ".",
            ".",
        ]
        attrs = [f"seqlen={self.query_length}", "tax=" + self._tax_attribute()]
        if self.binning_type == BINNING_NONE:
            attrs.append(f"rtax={tax.taxid_of(self.rtax)}")
            if 0.0 <= self.interpolation_value < 1.0:
                attrs.append("ival=" + cxx_float(self.interpolation_value))
        elif self.binning_type == BINNING_SINGLE:
            if self.interpolation_value >= 0.0:
                attrs.append("ival=" + cxx_float(self.interpolation_value))
            attrs.append("binning=single")
        elif self.binning_type == BINNING_DIRECT:
            attrs.append("binning=direct")
        elif self.binning_type == BINNING_FALLBACK:
            attrs.append("binning=fallback")
        return TAB.join(cols) + TAB + ";".join(attrs)

    def _tax_attribute(self) -> str:
        # reference: predictionrecord.hh:291-308 — walk lower -> upper,
        # print a node only when its support differs from the last printed
        tax = self.tax
        assert self.lower_node >= 0 and self.upper_node >= 0 and self.taxon_support
        out = []
        last_support = 0
        node = self.lower_node
        i = len(self.taxon_support) - 1
        while node != self.upper_node:
            if self.taxon_support[i] != last_support:
                out.append(f"{tax.taxid_of(node)}:{self.taxon_support[i]}-")
                last_support = self.taxon_support[i]
            i -= 1
            node = int(tax.parent[node])
        out.append(tax.taxid_of(node))
        if self.taxon_support[i] != last_support:
            out.append(f":{self.taxon_support[i]}")
        return "".join(out)

    # ------------------------------------------------------------------ parsing
    def parse(self, line: str):
        """reference: predictionrecord.hh:192-244 + parseKeyValue :312-380"""
        if not line:
            raise ParsingError("empty GFF3 line")
        fields = tokenize_single_char(line, TAB, 9, False)
        if len(fields) < 9:
            raise ParsingError("too few GFF3 fields in line")
        try:
            self.query_feature_begin = int(fields[3])
            self.query_feature_end = int(fields[4])
        except ValueError:
            raise ParsingError("bad GFF3 feature position") from None
        if self.query_feature_begin > self.query_feature_end:
            raise ParsingError("GFF3 reverse query positions")
        try:
            self.signal_strength = (
                float("nan") if fields[5] == "." else float(np.float32(fields[5]))
            )
        except ValueError:
            raise ParsingError("bad GFF3 taxonomic signal score") from None

        self.interpolation_value = -1.0
        for kv in tokenize_single_char(fields[8], ";", 0, True):
            parts = tokenize_single_char(kv, "=", 2, False)
            if len(parts) < 2:
                continue
            self._parse_key_value(parts[0], parts[1])
        if self.interpolation_value == -1.0:
            # default for output compression (predictionrecord.hh:239)
            self.interpolation_value = 1.0
        self.query_identifier = fields[0]
        return self

    def _parse_key_value(self, key: str, value: str):
        tax = self.tax
        try:
            if key == "seqlen":
                self.query_length = int(value)
                return
            if key == "ival":
                self.interpolation_value = float(np.float32(value))
                return
            if key == "binning":
                self.binning_type = {
                    "single": BINNING_SINGLE,
                    "direct": BINNING_DIRECT,
                    "fallback": BINNING_FALLBACK,
                }.get(value, BINNING_NONE)
                return
            if key == "rtax":
                self.rtax = tax.node(value)
                return
            if key == "tax":
                entries = tokenize_single_char(value, "-", 0, False)
                first = tokenize_single_char(entries[0], ":", 2, False)
                taxid = first[0]
                if first[1] == "":
                    support = self.feature_width
                else:
                    support = int(first[1])
                last_node = tax.node(taxid)
                self.lower_node = last_node
                tmp_support: List[int] = []
                k = 1
                while entries[k] != "":  # trailing empty token terminates
                    parts = tokenize_single_char(entries[k], ":", 2, False)
                    node = tax.node(parts[0])
                    if not tax.is_parent_of(node, last_node):
                        raise ParsingError(
                            "bad taxon path",
                            taxid=tax.taxid_of(node),
                            child=tax.taxid_of(last_node),
                        )
                    steps = int(tax.depth[last_node]) - int(tax.depth[node])
                    for _ in range(steps):
                        tmp_support.insert(0, support)
                    if parts[1] != "":
                        support = int(parts[1])
                    last_node = node
                    k += 1
                tmp_support.insert(0, support)
                self.upper_node = last_node
                self.taxon_support = tmp_support
                return
        except ValueError:
            raise ParsingError("bad GFF3 key value", key=key) from None


def iter_prediction_records(stream, tax: FlatTaxonomy):
    """PredictionFileParser analog (reference: predictionrecord.hh:470-498)."""
    for raw in stream:
        line = raw.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        rec = PredictionRecord(tax)
        rec.parse(line)
        yield rec
