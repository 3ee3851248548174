// Test-only shim.
#ifndef TAXTK_SHIM_BOOST_REMOVE_POINTER_HPP
#define TAXTK_SHIM_BOOST_REMOVE_POINTER_HPP
#include <type_traits>
namespace boost {
template <class T>
struct remove_pointer : std::remove_pointer<T> {};
}  // namespace boost
#endif
