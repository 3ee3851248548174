// Shim: comparisons come from the std::tuple base (found via ADL on the
// base class namespace), so nothing to define here.  Test-only.
#ifndef TAXTK_SHIM_BOOST_TUPLE_COMPARISON_HPP
#define TAXTK_SHIM_BOOST_TUPLE_COMPARISON_HPP
#include "tuple.hpp"
#endif
