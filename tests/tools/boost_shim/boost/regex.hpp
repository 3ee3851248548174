// Test-only shim: boost::regex over std::regex (alignmentsfilter.hh's
// RemoveIdent*Filter classes; ECMAScript grammar differences from
// boost's default Perl grammar are irrelevant — the oracle harness never
// instantiates those filters).
#ifndef TAXTK_SHIM_BOOST_REGEX_HPP
#define TAXTK_SHIM_BOOST_REGEX_HPP

#include <regex>

namespace boost {

using regex = std::regex;
using cmatch = std::cmatch;
using smatch = std::smatch;
using std::regex_match;
using std::regex_search;

}  // namespace boost

#endif
