// Test-only shim: boost::math::isnan over std::isnan.
#ifndef TAXTK_SHIM_BOOST_MATH_FPCLASSIFY_HPP
#define TAXTK_SHIM_BOOST_MATH_FPCLASSIFY_HPP

#include <cmath>

namespace boost {
namespace math {

template <class T>
inline bool isnan(T x) {
    return std::isnan(x);
}

}  // namespace math
}  // namespace boost

#endif
