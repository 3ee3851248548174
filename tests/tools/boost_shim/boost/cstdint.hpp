// Test-only shim: the reference's types.hh uses int_least8_t etc.
// unqualified, so this must inject the C stdint typedefs at global scope
// exactly like boost/cstdint.hpp does.
#ifndef TAXTK_SHIM_BOOST_CSTDINT_HPP
#define TAXTK_SHIM_BOOST_CSTDINT_HPP
#include <stdint.h>
namespace boost {
using ::int64_t;
using ::int32_t;
using ::int16_t;
using ::int8_t;
using ::uint64_t;
using ::uint32_t;
using ::uint16_t;
using ::uint8_t;
}  // namespace boost
#endif
