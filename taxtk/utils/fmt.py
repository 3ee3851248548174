"""C++-iostream-compatible number formatting.

The reference writes floats through default-formatted std::ostream, which is
equivalent to printf("%.6g") after promotion to double (6 significant digits,
scientific fallback).  To keep GFF3/alignment output byte-identical we
reproduce exactly that, including float32 rounding of values that the
reference stores in `float` fields (scores, ival, signal strength).

(reference: core/src/alignmentrecord.hh:160-178 record printing,
 core/src/predictionrecord.hh:248-309 GFF3 serialization)
"""

import numpy as np

_F32 = np.float32


def parse_float32(text: str) -> np.float32:
    """Parse text to float32 the way boost::lexical_cast<float> does
    (strtof: parse as decimal, round to nearest float32)."""
    return _F32(text)


def cxx_double(value: float) -> str:
    """Format a double like `std::ostream << double` (printf %.6g)."""
    s = "%.6g" % float(value)
    return s


def cxx_float(value) -> str:
    """Format a float32-valued quantity like `std::ostream << float`:
    the float is promoted to double, then printed with %.6g."""
    return "%.6g" % float(_F32(value))
